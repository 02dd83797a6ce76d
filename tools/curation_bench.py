"""Composed curation-pipeline capstone: the chained DAG at sf1.

Every operator is benched solo at sf0.1; the production story is the
COMPOSED chain over 10x more data.  This tool runs the full curation
pipeline end-to-end —

    quality filter -> exact dedup -> benchmark decontamination
    -> token-budget mixture -> shard packing

— over an sf1-equivalent corpus (sf0.1 ``documents`` replicated
``--scale`` times with shifted doc_ids and per-replica text suffixes,
so replicas are distinct documents, not artificial duplicates), with
per-stage wall-clock and per-stage output row counts, and asserts the
END STATE of every stage against a DuckDB replay of the same chain on
the same parquet.

Execution model: each Spark stage materializes via an eager
``localCheckpoint`` barrier — per-stage time is that stage's real
work, and downstream stages read materialized input (the production
shape: curation pipelines persist between stages so a failed stage
retries alone).

Mixture budgets are data-derived (40% of each source's surviving
n_chars), computed once in DuckDB from the same chain prefix and
injected as literals into BOTH engines — the comparison never trusts
either engine's own derivation.

Usage: python tools/curation_bench.py [--scale N] [--repeat N] [sf_dir]
Prints one JSON line; exits 1 on any per-stage count mismatch.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dax_ppdb_spark.session import get_spark  # noqa: E402

BENCH_LO, BENCH_HI = 100, 119  # benchmark = these base-replica doc_ids
QUALITY_MIN = 0.4
SHARD_CHARS = 100_000
BUDGET_FRAC = 0.4


def build_corpus(spark, sf_dir: str, scale: int, out: str) -> None:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    parts = [docs]
    for i in range(1, scale):
        parts.append(
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 100_000_000)
            ).withColumn("text", F.concat(F.col("text"), F.lit(f" r{i}")))
        )
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    full.write.mode("overwrite").parquet(out)


def duck_chain_sql(budget_case: str) -> str:
    """The DuckDB replay: same chain, same literals, stage counts."""
    from dax_ppdb_spark.llm_queries import _STOP_LIST, _TOKS, _SHINGLES5
    from dax_ppdb_spark.llm.text import md5_long_sql

    quality_expr = f"""
           least(len({_TOKS}) / 100.0, 1.0) * 0.4
           + (CAST(len(list_filter({_TOKS}, t -> lower(t) IN ({_STOP_LIST}))) AS DOUBLE)
              / greatest(len({_TOKS}), 1)) * 0.3
           + 1.0 / (1.0 + (CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                     AS DOUBLE) / greatest(length(text), 1)) * 10.0) * 0.3
    """
    return f"""
WITH s1 AS (
    SELECT doc_id, source, n_chars, text FROM documents
    WHERE ({quality_expr}) >= {QUALITY_MIN}
),
s2 AS (
    SELECT * FROM s1
    WHERE doc_id IN (SELECT MIN(doc_id) FROM s1 GROUP BY md5(text))
),
bench AS (
    SELECT DISTINCT unnest({_SHINGLES5}) AS shingle FROM documents
    WHERE doc_id BETWEEN {BENCH_LO} AND {BENCH_HI} AND len({_TOKS}) >= 5
),
contaminated AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest({_SHINGLES5}) AS shingle FROM s2
        WHERE len({_TOKS}) >= 5
    ) JOIN bench USING (shingle)
),
s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
s4 AS (
    SELECT doc_id, source, n_chars FROM (
        SELECT *, SUM(n_chars) OVER (
            PARTITION BY source
            ORDER BY {md5_long_sql("'mix' || CAST(doc_id AS VARCHAR)")}, doc_id
        ) - n_chars AS prefix,
        {budget_case} AS budget
        FROM s3
    ) WHERE prefix < budget
),
s5 AS (
    SELECT doc_id, source,
           CAST(FLOOR((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id)
                       - n_chars) / {SHARD_CHARS}.0) AS BIGINT) AS shard_id
    FROM s4
)
SELECT (SELECT COUNT(*) FROM s1), (SELECT COUNT(*) FROM s2),
       (SELECT COUNT(*) FROM s3), (SELECT COUNT(*) FROM s4),
       (SELECT COUNT(*) FROM s5),
       (SELECT COUNT(*) FROM (SELECT DISTINCT source, shard_id FROM s5))
"""


def run(spark, sf_dir: str, scale: int) -> dict:
    """Build the scaled corpus, run the Spark chain (one checkpoint
    barrier per stage) and the DuckDB replay, return the comparison
    payload.  Importable so the unit suite can gate chain parity per
    commit at a small scale."""
    from dax_ppdb_spark.llm.text import quality_metrics
    from dax_ppdb_spark.llm.dedup import contaminated_docs
    from dax_ppdb_spark.llm.sampling import pack_shards, token_budget_mixture
    from pyspark.sql import Window

    tmp = tempfile.mkdtemp(prefix="curation_bench_")
    try:
        corpus = os.path.join(tmp, "documents.parquet")
        build_corpus(spark, sf_dir, scale, corpus)

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{corpus}/*.parquet')"
        )
        # Data-derived budgets from the chain prefix (shared literals).
        from dax_ppdb_spark.llm_queries import _STOP_LIST, _TOKS, _SHINGLES5  # noqa: F401

        chain = duck_chain_sql("0")  # budget placeholder; prefix CTEs only
        prefix_sql = chain.split(",\ns4 AS")[0] + (
            f" SELECT source, CAST(FLOOR(SUM(n_chars) * {BUDGET_FRAC}) AS BIGINT)"
            " FROM s3 GROUP BY source ORDER BY source"
        )
        budgets = dict(con.execute(prefix_sql).fetchall())
        budget_case = (
            "CASE "
            + " ".join(
                f"WHEN source = '{s}' THEN {b}" for s, b in sorted(budgets.items())
            )
            + " ELSE 0 END"
        )

        # ----- Spark chain, one eager checkpoint barrier per stage ----
        docs = spark.read.parquet(corpus)
        stages: dict[str, float] = {}
        counts: dict[str, int] = {}

        def barrier(name: str, df):
            t0 = time.time()
            out = df.localCheckpoint(eager=True)
            counts[name] = out.count()
            stages[name] = round(time.time() - t0, 2)
            return out

        s1 = barrier(
            "quality",
            docs.withColumn(
                "q", quality_metrics(F.col("text"))["quality_score"]
            )
            .filter(F.col("q") >= QUALITY_MIN)
            .select("doc_id", "source", "n_chars", "text"),
        )
        w = Window.partitionBy(F.md5("text"))
        s2 = barrier(
            "exact_dedup",
            s1.withColumn("__keep", F.min("doc_id").over(w) == F.col("doc_id"))
            .filter("__keep")
            .drop("__keep"),
        )
        bench = docs.filter(F.col("doc_id").between(BENCH_LO, BENCH_HI))
        cont = contaminated_docs(s2, bench, n=5).select("doc_id")
        s3 = barrier("decontaminate", s2.join(cont, "doc_id", "left_anti"))
        s4 = barrier(
            "mixture",
            token_budget_mixture(
                s3.select("doc_id", "source", "n_chars"), budgets
            ),
        )
        s5 = barrier(
            "pack_shards",
            pack_shards(
                s4,
                size_col="n_chars",
                shard_tokens=SHARD_CHARS,
                order_cols=("doc_id",),
                partition_cols=("source",),
            ).select("doc_id", "source", "shard_id"),
        )
        n_shards = s5.select("source", "shard_id").distinct().count()

        # ----- DuckDB replay of the whole chain ----------------------
        t0 = time.time()
        duck = con.execute(duck_chain_sql(budget_case)).fetchone()
        duck_sec = round(time.time() - t0, 2)
        duck_counts = dict(
            zip(
                ["quality", "exact_dedup", "decontaminate", "mixture",
                 "pack_shards", "n_shards"],
                duck,
            )
        )
        got = {**counts, "n_shards": n_shards}
        return {
            "metric": "curation_pipeline_end_state_match",
            "value": bool(got == duck_counts),
            "scale": scale,
            "sf_dir": sf_dir,
            "spark_stage_sec": stages,
            "spark_total_sec": round(sum(stages.values()), 2),
            "duckdb_chain_sec": duck_sec,
            "stage_rows": got,
            "oracle_rows": duck_counts,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    argv = sys.argv[1:]
    scale = 10
    if "--scale" in argv:
        i = argv.index("--scale")
        scale = max(int(argv[i + 1]), 1)
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("curation-bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        payload = run(spark, sf_dir, scale)
    finally:
        spark.stop()
    print(json.dumps(payload))
    return 0 if payload["value"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
