"""Adjudicate bigram_lm_score at a REALISTIC vocabulary.

The round-7 verdict's one open question on this query: the sf0.1 bench
corpus has only ~31 distinct words, so the bigram/unigram model joins
degenerate into pure stage overhead for Spark while DuckDB one-shots
the whole thing in-cache — the measured 6-10x ratio says nothing about
the plan at a real vocabulary.  This tool builds a like-for-like
corpus where the ratio IS meaningful:

- Read the sf0.1 ``documents`` table and rewrite each token occurrence
  to ``w<id>`` with ``id`` drawn log-uniformly from [1, V) (V=30000 by
  default) — i.e. a Zipf-like marginal (p(id) ~ 1/id), which is the
  empirical shape of natural-language unigram frequency.  Per-doc
  token COUNTS and doc structure are preserved; only the vocabulary is
  replaced.  The draw is md5-derived from (doc_id, position), so the
  corpus is deterministic and both engines read the SAME parquet.
- Run the UNCHANGED registered Spark query (q_bigram_lm_score) and its
  UNCHANGED DuckDB oracle against that corpus, min-of-N wall clock,
  after the same sf0.001 warmup discipline as bench_compare.py.

With ``--scale N`` the corpus is replicated N times with shifted
doc_ids BEFORE the vocabulary rewrite — the md5 draw depends on
doc_id, so replicas get genuinely different text (no artificial
near-dups), and the comparison shows where the DuckDB-vs-Spark ratio
goes as the corpus leaves the stage-overhead regime.

Usage: python tools/vocab_bench.py [V] [--repeat N] [--scale N] [sf_dir]
"""

from __future__ import annotations

import math
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


def main() -> None:
    argv = sys.argv[1:]
    repeat = 3
    if "--repeat" in argv:
        i = argv.index("--repeat")
        repeat = max(int(argv[i + 1]), 1)
        del argv[i : i + 2]
    scale = 1
    if "--scale" in argv:
        i = argv.index("--scale")
        scale = max(int(argv[i + 1]), 1)
        del argv[i : i + 2]
    vocab = int(argv[0]) if argv else 30_000
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    from dax_ppdb_spark.llm.text import md5_long, tokens
    from dax_ppdb_spark.llm_queries import _BIGRAM_LM_SQL
    from dax_ppdb_spark import driver_queries

    spark = get_spark("vocab-bench")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="vocab_bench_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        if scale > 1:
            base = docs
            for i in range(1, scale):
                docs = docs.unionByName(
                    base.withColumn(
                        "doc_id", F.col("doc_id") + F.lit(i * 100_000_000)
                    )
                )
        # log-uniform id in [1, V): id = floor(exp(u * ln V)), u ~ U[0,1)
        # from a 6-digit md5 slice — Zipf-like marginal, deterministic.
        ln_v = float(math.log(vocab))
        toks = tokens(F.col("text"))
        new_text = F.concat_ws(
            " ",
            F.transform(
                toks,
                lambda t, i: F.concat(
                    F.lit("w"),
                    F.floor(
                        F.exp(
                            (
                                F.pmod(
                                    md5_long(
                                        F.concat_ws(
                                            "#",
                                            F.col("doc_id").cast("string"),
                                            i.cast("string"),
                                        )
                                    ),
                                    F.lit(1_000_000),
                                )
                                / F.lit(1_000_000.0)
                            )
                            * F.lit(ln_v)
                        )
                    ).cast("string"),
                ),
            ),
        )
        docs.withColumn("text", new_text).write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp}/documents.parquet/*.parquet')"
        )
        n_uni, n_big = con.execute(
            "WITH t AS (SELECT regexp_extract_all(text, '\\S+') AS toks "
            "FROM documents) "
            "SELECT (SELECT COUNT(DISTINCT tk) FROM (SELECT unnest(toks) "
            "AS tk FROM t)), (SELECT COUNT(*) FROM (SELECT toks[i] AS v, "
            "toks[i+1] AS w, COUNT(*) AS c FROM (SELECT toks, "
            "unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2) "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2))"
        ).fetchone()
        print(f"corpus: vocab={n_uni} distinct unigrams, "
              f"{n_big} kept bigrams (c2>=2), V param={vocab}")

        queries = driver_queries.queries()
        q = queries["bigram_lm_score"]
        # warmup: JIT the expression tree on the tiny corpus
        warm = "/root/testdata/sf0.001"
        if os.path.isdir(warm):
            q(spark, warm).write.mode("overwrite").format("noop").save()

        duck = sprk = None
        for _ in range(repeat):
            t0 = time.time()
            con.execute(_BIGRAM_LM_SQL).fetchall()
            dt = time.time() - t0
            duck = dt if duck is None else min(duck, dt)
            t0 = time.time()
            q(spark, tmp).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            sprk = dt if sprk is None else min(sprk, dt)
        print(
            f"bigram_lm_score @ realistic vocab: duckdb={duck:.3f}s  "
            f"spark={sprk:.3f}s  ratio={sprk / duck:.2f}x  (min of {repeat})"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
