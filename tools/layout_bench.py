"""Layout evidence: what the bucketed layout actually buys.

Times the same fact-to-fact join (lineitem joined to orders on
``l_orderkey``/``o_orderkey``, aggregating revenue per order priority)
three ways on identical data:

1. **shuffled** — plain parquet inputs, broadcast disabled: both sides
   exchange on the key every run (what every query pays without a
   layout);
2. **bucketed** — both sides pre-bucketed on the key via
   ``io/bucketed.py``: zero Exchange (the write-time shuffle is
   amortized across every subsequent query);
3. **bucketed-build** — the one-time cost of writing the two bucketed
   tables, to make the amortization trade explicit.

Also times a bucket-pruned point lookup against the full-scan
equivalent.  Prints one JSON line; numbers are recorded in
BASELINE.md.  Run on a quiet box: ``python tools/layout_bench.py
[sf_dir] [repeats]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dax_ppdb_spark.io.bucketed import (  # noqa: E402
    drop_bucketed,
    enable_sorted_bucket_scan,
    point_lookup,
    write_bucketed,
)
from dax_ppdb_spark.session import get_spark  # noqa: E402

BUCKETS = 32


def _join(li, orders):
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _time(fn, repeats):
    best = float("inf")
    out = None
    for _ in range(repeats):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("layout-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    enable_sorted_bucket_scan(spark)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    # warm the page cache / JIT before any timed run
    _join(li, orders).collect()

    shuffled_s, plain_rows = _time(lambda: _join(li, orders).collect(), repeats)

    t0 = time.monotonic()
    write_bucketed(li, "lb_lineitem", "l_orderkey", BUCKETS)
    write_bucketed(orders, "lb_orders", "o_orderkey", BUCKETS)
    build_s = time.monotonic() - t0
    try:
        bli = spark.table("lb_lineitem")
        bor = spark.table("lb_orders")
        plan = (
            _join(bli, bor)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the only Exchange allowed is the post-join priority rollup's
        # (a different key, rows already reduced); the JOIN key must
        # never shuffle on either side, and the single-file sorted
        # buckets make the merge join Sort-free too
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Sort [l_orderkey" not in plan and "Sort [o_orderkey" not in plan
        bucketed_s, bucketed_rows = _time(
            lambda: _join(bli, bor).collect(), repeats
        )
        assert sorted(map(tuple, plain_rows)) == sorted(
            map(tuple, bucketed_rows)
        ), "bucketed join diverges from shuffled join"

        some_key = orders.select("o_orderkey").head()[0]
        full_scan_s, hit = _time(
            lambda: bor.filter(F.col("o_orderkey") == some_key).collect(),
            repeats,
        )
        pruned_s, hit2 = _time(
            lambda: point_lookup(spark, "lb_orders", "o_orderkey", some_key),
            repeats,
        )
        assert len(hit) == len(hit2) == 1
    finally:
        drop_bucketed(spark, "lb_lineitem")
        drop_bucketed(spark, "lb_orders")

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "repeats": repeats,
                "buckets": BUCKETS,
                "join_shuffled_s": round(shuffled_s, 3),
                "join_bucketed_s": round(bucketed_s, 3),
                "bucketed_build_s": round(build_s, 3),
                "join_speedup": round(shuffled_s / bucketed_s, 2),
                "breakeven_queries": (
                    round(build_s / (shuffled_s - bucketed_s), 1)
                    if shuffled_s > bucketed_s
                    else None
                ),
                "lookup_fullscan_s": round(full_scan_s, 3),
                "lookup_pruned_s": round(pruned_s, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
