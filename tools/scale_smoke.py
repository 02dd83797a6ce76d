"""Scale-growth regression gate (part of `make check`).

Replays the three historically scale-sensitive plans at 1x and Nx
data and FAILS (exit 1) if any grows past its ceiling:

- ``asof_attribution``  — was 5.7x under 10x data when the as-of join
  materialized per-key candidate pairs; the union-merge window shape
  must stay ~linear.
- ``range_join``        — was 6.2x when the bucket width was a caller
  constant; the derived width must keep buckets selective.
- ``dedup_embedding_banded`` — was 20.2x when the sign-LSH plane
  count was fixed; the corpus-scaled default must keep bucket
  occupancy flat.

These are exactly the regressions a parameter-default drift would
reintroduce silently: CORRECTNESS stays green (results are
plan-independent) and sf0.1 bench noise can hide them, so the gate
measures growth, not absolute time.  The ceiling is generous
(linear growth + scheduling-noise allowances) — it exists to catch
the quadratic term coming back (>= N^2-ish growth), not to police
small constant factors.

Usage: python tools/scale_smoke.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_check import scale_table  # noqa: E402

from dax_ppdb_spark import driver_queries  # noqa: E402
from dax_ppdb_spark.session import get_spark  # noqa: E402

# query -> tables it reads (only these get replicated)
GATED: dict[str, tuple[str, ...]] = {
    "asof_attribution": ("events",),
    "range_join": ("part", "lineitem"),
    "dedup_embedding_banded": ("embeddings",),
    # in-cell quadratic kNN bounded by the corpus-scaled plane rule
    "knn_label_noise": ("embeddings",),
    # corpus-scaled k (~sqrt N) Lloyd + per-cell ranking window
    "embedding_outliers": ("embeddings",),
    # corpus-derived two-level quantizer sizes (k1=k2~N^(1/4))
    "semdedup": ("embeddings",),
    # md5-fingerprinted gram shuffles + df-threshold join
    "dup_spans": ("documents",),
    "dedup_span_removal": ("documents",),
}
# growth ceiling at Nx data: time_Nx <= max(CEIL_FACTOR * N * time_1x,
# time_1x + ABS_ALLOWANCE_S).  The absolute allowance keeps sub-second
# bases from failing on fixed job-scheduling overhead.
CEIL_FACTOR = 1.5
ABS_ALLOWANCE_S = 3.0


def _run(spark, registry, name: str, sf_dir: str) -> float:
    t0 = time.time()
    registry[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    registry = driver_queries.all_queries()

    tables = sorted({t for ts in GATED.values() for t in ts})
    tmp = tempfile.mkdtemp(prefix="scale_smoke_")
    failures = 0
    try:
        for t in tables:
            scale_table(spark, sf_dir, tmp, t, n)
        # JVM/codegen warm-up so the 1x timing is steady-state
        for name in GATED:
            _run(spark, registry, name, sf_dir)
        for name in GATED:
            base = _run(spark, registry, name, sf_dir)
            big = _run(spark, registry, name, tmp)
            limit = max(CEIL_FACTOR * n * base, base + ABS_ALLOWANCE_S)
            ok = big <= limit
            print(
                f"{'OK  ' if ok else 'FAIL'} {name}: 1x={base:.2f}s "
                f"{n}x={big:.2f}s growth={big / max(base, 1e-9):.1f}x "
                f"(limit {limit:.2f}s)"
            )
            failures += 0 if ok else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
