"""Spark-vs-DuckDB wall-clock comparison on the bench headline queries.

The BASELINE target (BASELINE.json) is "within 2x of DuckDB on the
same sf parquet" — the reference publishes no numbers, so DuckDB
executing the oracle SQL is the stand-in single-node baseline.

Usage: python tools/bench_compare.py [sf_dir] [--md]
Prints query | duckdb s | pyspark s | ratio, plus a markdown table
with --md (paste into BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from dax_ppdb_spark.session import TABLES, get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md = "--md" in sys.argv
    sf_dir = args[0] if args else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # Lazily-resolved oracles (size-derived SQL) must see the same
    # corpus the DuckDB views below read.
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = [n for n in HEADLINE if n in queries and n in oracles]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("bench-compare")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm both engines so the table compares steady-state execution,
    # not first-evaluation costs (JVM JIT on the Spark side is worth
    # 2-3x on complex expression trees; DuckDB's per-query compile is
    # milliseconds either way).  Same policy as bench.py: one untimed
    # pass of every query against the tiny sf0.001 tables.
    warm_dir = "/root/testdata/sf0.001"
    from dax_ppdb_spark import driver_queries

    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        driver_queries.ensure_sky_sorted(spark, warm_dir)
        for name in names:
            try:
                queries[name](spark, warm_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception:
                pass
    queries[names[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()
    con.execute(oracles[names[0]]).fetchall()
    driver_queries.ensure_sky_sorted(spark, sf_dir)

    rows = []
    for name in names:
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        duck = time.time() - t0
        t0 = time.time()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        sprk = time.time() - t0
        rows.append((name, duck, sprk, sprk / duck if duck > 0 else float("inf")))
        print(f"{name:28s} duckdb={duck:7.3f}s  spark={sprk:7.3f}s  ratio={sprk/max(duck,1e-9):6.2f}x")

    total_d = sum(r[1] for r in rows)
    total_s = sum(r[2] for r in rows)
    print(f"{'TOTAL':28s} duckdb={total_d:7.3f}s  spark={total_s:7.3f}s  ratio={total_s/total_d:6.2f}x")

    if md:
        print("\n| query | duckdb s | pyspark s | ratio |")
        print("|---|---|---|---|")
        for name, duck, sprk, ratio in rows:
            print(f"| {name} | {duck:.2f} | {sprk:.2f} | {ratio:.2f}x |")
        print(f"| **total** | {total_d:.2f} | {total_s:.2f} | {total_s/total_d:.2f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
