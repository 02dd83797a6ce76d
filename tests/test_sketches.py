"""KMV sketch properties: merge(sketch(A), sketch(B)) == sketch(A∪B)
(the whole point — per-partition sketches composable into rollups),
exactness below k, and estimator error on a known cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F

from dax_ppdb_spark.ops.sketches import kmv_estimate, kmv_merge, kmv_sketch


def _rows(n, key, start=0):
    return [(key, start + i) for i in range(n)]


def test_merge_equals_whole(spark):
    a = spark.createDataFrame(_rows(300, "x") + _rows(50, "y"), "k string, v long")
    b = spark.createDataFrame(_rows(300, "x", start=150) + _rows(20, "z"), "k string, v long")
    whole = a.unionByName(b)

    sk_parts = kmv_merge(
        kmv_sketch(a, ["k"], "v", k=32).unionByName(kmv_sketch(b, ["k"], "v", k=32)),
        ["k"],
        k=32,
    )
    sk_whole = kmv_sketch(whole, ["k"], "v", k=32)

    got = {r["k"]: r["kmv"] for r in sk_parts.collect()}
    want = {r["k"]: r["kmv"] for r in sk_whole.collect()}
    assert got == want


def test_exact_below_k_and_bounded_error_above(spark):
    df = spark.createDataFrame(
        _rows(5000, "big") + _rows(10, "small"), "k string, v long"
    )
    out = {
        r["k"]: (r["est"], r["n"])
        for r in kmv_sketch(df, ["k"], "v", k=128)
        .select(
            "k",
            kmv_estimate(F.col("kmv"), k=128).alias("est"),
            F.size("kmv").alias("n"),
        )
        .collect()
    }
    est_small, n_small = out["small"]
    assert n_small == 10 and est_small == 10.0  # exact below k
    est_big, _ = out["big"]
    # KMV std error ~ 1/sqrt(k-2) ≈ 8.9%; allow 4 sigma.
    assert abs(est_big - 5000) / 5000 < 0.36
