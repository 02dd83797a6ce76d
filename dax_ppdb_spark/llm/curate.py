"""Incremental corpus curation: the standing-state twin of the
one-shot curation chain (``llm_queries.q_corpus_curate`` /
``tools/curation_bench.py``).

Production corpora are not curated once — batches arrive and each must
be deduplicated against EVERYTHING already seen without re-reading the
corpus.  This module composes the persisted building blocks the
engine already serves (the MinHash band index family —
``build_dedup_index`` / ``probe_dedup_index`` / ``append_to_dedup_index``
— and the versioned ``ParquetTable`` commit protocol) into one batch
step whose cumulative output is PROVABLY the one-shot result:

    curate_batch(b1); curate_batch(b2); ...  ==  one-shot curation
    of b1 ∪ b2 ∪ ...                          (id-ascending batches)

The equivalence (pinned by ``tests/test_curate_incremental.py``) holds
because every stage's keep rule is an "earlier doc wins" rule:

- exact dedup keeps the min doc_id per md5(text): within-batch keep-min
  plus an anti-join against the standing md5 set IS global keep-min
  when batch id ranges ascend;
- near-dup drops every ``doc_b`` of a verified pair (doc_a < doc_b):
  the standing index holds every prior EXACT-SURVIVOR (kept or
  near-dup-dropped — a dropped doc can still be the earlier witness
  that drops a later one), so probe pairs (new vs seen) plus
  within-batch pairs reproduce exactly the one-shot pair set.

Bucket capping (``max_bucket``) is the one knob that breaks bit
equivalence: a band bucket grows across batches, so a bucket the
one-shot run caps out may still be under the cap at an early batch
(the incremental path then catches MORE near-dups, never fewer).
Pass ``max_bucket=None`` for bit-exact replay; keep the default for
production skew safety.

``curate_batch`` is additionally IDEMPOTENT under at-least-once
delivery: re-running ANY batch whose state commit already landed —
even after later batches extended the state — returns the SAME
curated rows, because every drop rule is the one-shot lower-id rule
(the md5 anti-join requires a DIFFERENT owner id, the index probe
requires ``corpus_id < new_id``) and state appends are keyed by
doc_id.  A ``foreachBatch`` sink that overwrites per-batch partitions
therefore gets exactly-once output end to end
(:func:`~..streaming.chunks.stream_curated`).

Reference scope note: the reference engine has no curation surface —
this is part of the beyond-reference LLM-data library; the state
commit discipline mirrors its chunk-ledger exactly-once design
(``ppdb-replication`` chunk idempotency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import (
    DEFAULT_MAX_BUCKET,
    append_to_dedup_index,
    build_dedup_index,
    probe_dedup_index,
    verified_neardup_pairs,
)


def _seen_table(state_root: str):
    import os

    from ..io.table import ParquetTable

    return ParquetTable(os.path.join(state_root, "seen"))


def curate_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_root: str,
    quality_min: float = 0.4,
    threshold: float = 0.5,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curate one batch against the standing state under
    ``state_root`` and extend the state; returns the curated batch
    rows (the batch's columns, survivors only).

    Stages: quality filter -> exact dedup (within batch, then vs the
    standing md5 set) -> verified near-dup (within batch, then a
    probe of the persisted band index; candidates verified by exact
    shingle Jaccard >= ``threshold``) -> state append (band keys +
    (doc_id, text, md5) of every exact-survivor, one versioned commit
    each — a re-run of a crashed batch rebuilds the same state).

    Scale shape: the batch never joins the corpus — the md5 anti-join
    streams the standing hash column, the probe broadcasts the
    batch's band keys onto a partition-pruned index scan, and
    verification fetches candidate text only.  Per-batch cost is
    O(batch + matched buckets), independent of corpus size.
    """
    seen = _seen_table(state_root)
    first = not seen.exists()

    q = batch.filter(
        _quality_score(F.col(text_col)) >= F.lit(quality_min)
    )
    w = Window.partitionBy(F.md5(F.col(text_col)))
    in_batch = (
        q.withColumn("__keep", F.min(id_col).over(w) == F.col(id_col))
        .filter("__keep")
        .drop("__keep")
    )
    if first:
        survivors_exact = in_batch
    else:
        # Drop a batch doc iff some OTHER doc already owns its md5 —
        # a seen row with the SAME id is this very doc redelivered
        # (at-least-once ingest), and redelivery must reproduce the
        # original output, not curate to empty (idempotence; see the
        # streaming wrapper's exactly-once contract).
        seen_rows = seen.read(spark).select(
            F.col("md5").alias("__seen_md5"),
            F.col(id_col).alias("__seen_id"),
        )
        b = in_batch.withColumn("__md5", F.md5(F.col(text_col)))
        survivors_exact = b.join(
            seen_rows,
            (b["__md5"] == seen_rows["__seen_md5"])
            & (b[id_col] != seen_rows["__seen_id"]),
            "left_anti",
        ).drop("__md5")
    # Multi-consumer relation (within-batch pairs, probe, two state
    # appends, output anti-join): truncate lineage so the quality +
    # dedup work runs once.
    survivors_exact = survivors_exact.localCheckpoint(eager=False)

    pairs_in = verified_neardup_pairs(
        survivors_exact, k, bands, n, threshold, text_col, id_col, max_bucket
    ).select(F.col("doc_b").alias(id_col))
    if first:
        drop_ids = pairs_in
    else:
        corpus_txt = seen.read(spark).select(
            F.col(id_col), F.col(text_col)
        )
        # A corpus witness counts only when its id is LOWER than the
        # probed doc's — exactly the one-shot drop-doc_b rule.  This
        # single predicate makes the step idempotent against ANY
        # replay: the (x, x) self-pair never drops x, a same-batch
        # higher-id doc in the index (redelivery) cannot outrank the
        # within-batch ordering pairs_in owns, and a LATER batch's
        # docs in the index cannot retroactively drop a replayed
        # earlier batch's survivors.  On a fresh id-ascending batch
        # every genuine witness has a lower id, so the filter is a
        # no-op there.
        px = (
            probe_dedup_index(
                spark,
                state_root,
                survivors_exact,
                corpus_txt,
                threshold,
                text_col,
                id_col,
                max_bucket,
            )
            .filter(F.col("corpus_id") < F.col("new_id"))
            .select(F.col("new_id").alias(id_col))
        )
        drop_ids = pairs_in.unionByName(px)

    curated = survivors_exact.join(
        drop_ids.distinct(), id_col, "left_anti"
    )

    # State append AFTER the curated frame is defined but computed
    # lazily — materialize the output first so the state commit never
    # races the caller's read of a pre-append lineage.
    curated = curated.localCheckpoint(eager=True)
    if first:
        build_dedup_index(
            survivors_exact, state_root, k, bands, n, text_col, id_col
        )
        seen.overwrite(_seen_rows(survivors_exact, text_col, id_col))
    else:
        # Append only NEW ids: a redelivered batch's survivors are
        # already in the state, and re-appending would duplicate seen
        # rows and band keys.
        novel = survivors_exact.join(
            seen.read(spark).select(id_col), id_col, "left_anti"
        ).localCheckpoint(eager=False)
        append_to_dedup_index(novel, state_root, text_col, id_col)
        seen.append_commit(_seen_rows(novel, text_col, id_col))
    return curated


def _seen_rows(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.col(text_col),
        F.md5(F.col(text_col)).alias("md5"),
    )


def _quality_score(text):
    from .text import quality_metrics

    return quality_metrics(text)["quality_score"]


def curate_oneshot(
    docs: DataFrame,
    quality_min: float = 0.4,
    threshold: float = 0.5,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The stateless equivalent of draining every batch through
    :func:`curate_batch`: quality -> global exact keep-min ->
    drop every verified near-dup pair's higher id.  Exists so the
    incremental path has an in-engine replay target (the equivalence
    test) and as the one-call form for corpora curated in one pass."""
    q = docs.filter(_quality_score(F.col(text_col)) >= F.lit(quality_min))
    w = Window.partitionBy(F.md5(F.col(text_col)))
    survivors = (
        q.withColumn("__keep", F.min(id_col).over(w) == F.col(id_col))
        .filter("__keep")
        .drop("__keep")
        .localCheckpoint(eager=False)
    )
    pairs = verified_neardup_pairs(
        survivors, k, bands, n, threshold, text_col, id_col, max_bucket
    )
    return survivors.join(
        pairs.select(F.col("doc_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
