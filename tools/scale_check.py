"""Scaling evidence: run headline operators at 1x and Nx data volume.

Synthesizes an Nx copy of the sf tables (ids shifted per replica so
keys stay unique and group counts scale with the data) into a temp
dir, then times representative queries at both scales on the same
local cluster. A scale-safe operator shows time growth ~= data growth
(or less); superlinear growth flags a shuffle/skew problem that would
bite at 100 TB.

Usage: python tools/scale_check.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dax_ppdb_spark.session import get_spark  # noqa: E402
from dax_ppdb_spark import driver_queries  # noqa: E402

QUERIES = [
    "validity_fill",
    "validity_fill_pruned",
    "latest_only",
    "merge_upsert",
    "merge_composite",
    "pricing_summary",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "repetition_ratio",
    "lm_score",
    "pii_redact",
    "token_count_bpe",
    "split_assign",
    "shard_pack",
    "stratified_sample",
    "spatial_box",
    "cone_search",
    "windowed_counts",
    "sessionize",
    "funnel",
    "retention_cohorts",
    "asof_attribution",
    "range_join",
    "crossmatch",
    "dedup_verified",
    "dedup_jaccard_prefix",
    "dedup_incr_prefix",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_embedding_banded",
    "doc_chunks",
    "cdc_chunks",
    "dedup_cdc",
    "gopher_quality",
    "top_ngrams",
    "overlap_violations",
    "snapshot_asof",
    "ann_topk_bruteforce",
    "ann_topk_multiprobe",
    "embedding_quantize",
    "dup_spans",
    "dup_substrings",
    "substring_span_removal",
    "dsir_weights",
    "semdedup",
    "semdedup_flat",
    "tfidf_keywords",
    "sample_exact_k",
    "dedup_edit",
    "hybrid_search",
    "source_overlap",
    "dedup_span_removal",
    "mixture_sample",
    "weighted_sample",
    "perplexity_buckets",
    "leak_safe_split",
    "ann_topk_ivf_sq8",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "url_dedup",
    "url_block_filter",
    "sequence_pack",
    "embedding_covariance",
    "dedup_paragraphs",
    "bigram_lm_score",
    "bpe_merges",
    "bpe_encode",
    "corpus_drift",
    "ann_index_persisted",
    "ann_index_pq",
    "bpe_merges_batched",
    "dedup_index_probe",
    "quality_classifier",
    "embedding_recall",
    "knn_label_noise",
    "embedding_outliers",
    "table_stats",
    "constraint_audit",
    "constraint_violations",
    # round 7: the remaining bench headliners join the table so every
    # non-trivial benched plan has a measured growth row
    # round 11: the HLL++ NDV lane (the 100-TB default for
    # table_stats; no oracle row — DuckDB's HLL estimates differ by
    # engine, so it is pytest- and scale-gated instead) and the
    # audit->quarantine->curate capstone
    "table_stats_approx",
    "audit_quarantine_curate",
    "column_histograms",
    # round 12: the GK approx-percentile lane pinned as the benched
    # 100-TB default for histograms (no oracle row — GK summaries
    # differ by engine; pytest- and scale-gated instead)
    "column_histograms_approx",
    "count_anomalies",
    "topk_per_key",
    "rank_versions",
    "semi_prune",
    "replication_diff",
    "revenue_by_nation",
    "rollup_revenue",
    "pivot_patch",
    "update_explode",
    "ledger_scan",
    "distinct_ids",
    "cone_search_sorted",
    "distinct_sketch",
    "dedup_embedding",
    "doc_fingerprint",
    "corpus_curate",
    "dedup_keep_best",
    "quality_quantiles",
    "ann_topk_ivf",
    "multimodal_decode",
    "constraint_audit",
    "constraint_violations",
]

# id columns to shift per replica so keys stay unique.  FOREIGN keys
# shift alongside their dimension's primary key (l_suppkey with
# s_suppkey, l_partkey with p_partkey) so each replica's facts join
# its own replica's dimensions 1:1 — an unshifted FK against a
# replicated dimension would give every fact row n matches and the
# probe would measure n^2 OUTPUT blow-up, not plan scaling (this was
# exactly revenue_by_nation's phantom 257x growth row).
ID_SHIFT = {
    "orders": (("o_orderkey", 100_000_000),),
    "lineitem": (
        ("l_orderkey", 100_000_000),
        ("l_suppkey", 100_000_000),
        ("l_partkey", 100_000_000),
    ),
    "customer": (("c_custkey", 100_000_000),),
    "part": (("p_partkey", 100_000_000),),
    "supplier": (("s_suppkey", 100_000_000),),
    "events": (("event_id", 100_000_000),),
    "documents": (("doc_id", 100_000_000),),
    "embeddings": (("vec_id", 100_000_000),),
}

# Fixed-cardinality dimensions: a 10x corpus has 10x documents, not
# 10x continents.  Copied once — replicating them duplicates their
# KEYS, and every join through them multiplies its output n-fold.
FIXED_DIMS = {"region", "nation"}


def scale_table(spark, src: str, dst: str, table: str, n: int) -> None:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    if table in FIXED_DIMS:
        df.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        return
    shifts = ID_SHIFT.get(table, ())
    parts = []
    for i in range(n):
        p = df
        if i > 0:
            for col, shift in shifts:
                p = p.withColumn(col, F.col(col) + F.lit(i * shift))
        if table == "documents" and i > 0:
            # Replica texts must NOT be near-dups of the base copy,
            # or the dedup operators' TRUE output grows ~n^2 (every
            # doc gains n-1 identical twins) and the probe measures
            # output blow-up, not plan scaling.  Tagging every token
            # with the replica id changes every shingle while keeping
            # token counts and doc structure — 10x independent data.
            p = p.withColumn(
                "text",
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1r{i}"),
            )
        if table == "part" and i > 0:
            # Replica parts occupy a DISJOINT price domain (a larger
            # catalog spans more SKU price territory).  Without the
            # shift every replica's tolerance band overlays the same
            # fixed [900, 2100] range, interval density grows n-fold,
            # and range_join's TRUE output grows ~n^2 — the probe
            # would measure output blow-up, not plan scaling (same
            # reasoning as the documents/embeddings treatments below).
            p = p.withColumn(
                "p_retailprice", F.col("p_retailprice") + F.lit(i * 100_000.0)
            )
        if table == "embeddings" and i > 0:
            # Same for vectors: a replica-dependent diagonal +/-1
            # transform (orthogonal!) preserves every within-replica
            # dot product and norm exactly while scrambling
            # cross-replica cosines AND sign-bucket keys — so bucket
            # occupancy stays flat as replicas multiply.  The mask is
            # md5-derived per replica (literal array), so no two
            # replicas share a flip pattern.
            import hashlib

            dim = p.select(F.size("embedding").alias("d")).first()["d"]
            digest = b""
            while len(digest) * 8 < dim:
                digest += hashlib.md5(f"replica-{i}-{len(digest)}".encode()).digest()
            bits = [(digest[j // 8] >> (j % 8)) & 1 for j in range(dim)]
            mask = F.array(*[F.lit(-1.0 if b else 1.0) for b in bits])
            p = p.withColumn(
                "embedding", F.zip_with("embedding", mask, lambda x, s: x * s)
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")


def time_queries(spark, registry, sf_dir: str) -> dict[str, float]:
    timings = {}
    registry[QUERIES[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()
    for name in QUERIES:
        t0 = time.time()
        registry[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = time.time() - t0
    return timings


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    # events.parquet stores TIMESTAMP(NANOS); read as raw ns (the
    # query fns standardize on integer µs regardless).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    registry = driver_queries.all_queries()
    # scale-study-only rows (no external registration; see QUERIES)
    from dax_ppdb_spark.ops.stats import table_stats as _tstats

    registry["table_stats_approx"] = lambda sp, d: _tstats(
        sp.read.parquet(f"{d}/lineitem.parquet"),
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_linenumber", "l_returnflag", "l_linestatus",
        ],
        approx=True,
    )
    from dax_ppdb_spark.driver_queries import _HIST_BUCKETS, _HIST_COLS
    from dax_ppdb_spark.ops.stats import column_histograms as _chist

    registry["column_histograms_approx"] = lambda sp, d: _chist(
        sp.read.parquet(f"{d}/lineitem.parquet"),
        columns=list(_HIST_COLS),
        buckets=_HIST_BUCKETS,
        approx=True,
    )

    tmp = tempfile.mkdtemp(prefix="scale_check_")
    try:
        tables = sorted(
            f[: -len(".parquet")] for f in os.listdir(sf_dir) if f.endswith(".parquet")
        )
        for t in tables:
            scale_table(spark, sf_dir, tmp, t, n)
        # cone_search_sorted benches the READ path of the geo-sorted
        # materialization; build it outside the timed region (bench.py
        # does the same)
        driver_queries.ensure_sky_sorted(spark, sf_dir)
        driver_queries.ensure_sky_sorted(spark, tmp)
        base = time_queries(spark, registry, sf_dir)
        big = time_queries(spark, registry, tmp)
        print(f"\n{'query':26s} {'1x s':>8s} {f'{n}x s':>8s} {'growth':>8s}  (data x{n})")
        for name in QUERIES:
            g = big[name] / max(base[name], 1e-9)
            flag = "  <-- superlinear" if g > n * 1.3 else ""
            print(f"{name:26s} {base[name]:8.2f} {big[name]:8.2f} {g:7.1f}x{flag}")
        # dedup_embedding_banded now derives its plane count from the
        # corpus size by default (llm.dedup.auto_bands), so the Nx run
        # above already exercises the corpus-scaling rule — no
        # hand-tuned probe needed (rounds 1-3 carried one; its 1.3x
        # measurement is now the default path's behavior).
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
