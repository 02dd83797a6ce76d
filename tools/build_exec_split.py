"""Split each query's wall-clock into DataFrame-BUILD vs EXECUTE time.

Round-13's two biggest perf wins were invisible to end-to-end timing
alone and obvious in this split:

- `audit_quarantine_curate` spent 3.5 s/call in driver-side plan
  analysis (py4j roundtrips + the O(m^3) inline occupancy cap) against
  <1 s of execution;
- `dedup_jaccard_prefix` paid ~3.9 s/call in the lazy checkpoint's
  plan-to-RDD step because a filter below the checkpoint inlined the
  shingle HOF tree into the predicate.

BUILD here = calling the registered query function (plan construction,
eager analysis, any driver-side training/collect the operator does,
and lazy-checkpoint plan-to-RDD); EXECUTE = noop-sink write of the
returned DataFrame.  A row whose build dominates is a DRIVER problem
(plan size, py4j chatter, per-call training, checkpoint pathology) —
fix it in the operator's construction, not its shuffle plan.

Usage: python tools/build_exec_split.py [sf_dir] [name ...]
       (default: the 15 slowest rows of BENCH_DETAIL.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dax_ppdb_spark.session import get_spark  # noqa: E402
from dax_ppdb_spark import driver_queries  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    registry = driver_queries.all_queries()
    # A typo'd name — including a misspelled sf_dir path that fails
    # isdir() and falls through into names — must not traceback on
    # registry[name] mid-run; report and drop it up front, same as the
    # BENCH_DETAIL branch below.
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries (skipped): {', '.join(unknown)}")
        names = [n for n in names if n in registry]
        if not names:
            return 1
    if not names:
        try:
            detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
            names = [
                n
                for n, _ in sorted(
                    detail["queries"].items(), key=lambda kv: -kv[1]
                )[:15]
                if n in registry
            ]
        except OSError:
            names = list(registry)[:15]
    spark = get_spark("build-exec-split")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'query':28s} {'build s':>8s} {'exec s':>8s} {'build %':>8s}")
    for name in names:
        fn = registry[name]
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as e:
            print(f"{name:28s} WARMUP ERROR {type(e).__name__}: {e}")
            continue
        builds, execs = [], []
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            builds.append(time.time() - t0)
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            execs.append(time.time() - t0)
        b, e = min(builds), min(execs)
        print(f"{name:28s} {b:8.2f} {e:8.2f} {100 * b / max(b + e, 1e-9):7.0f}%")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
