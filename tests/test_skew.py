"""Skew diagnostics: the measurement feeding the salted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from dax_ppdb_spark.ops.latest import topk_per_key
from dax_ppdb_spark.ops.skew import (
    key_histogram,
    skew_report,
    suggest_salt_buckets,
)
from tests.test_plans import plan_of


def _skewed_df(spark, n=10_000, hot_share=0.9):
    """90% of rows on key 0, the rest spread over 100 keys."""
    hot = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise((F.col("id") % 100) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_histogram_counts(spark):
    df = _skewed_df(spark)
    hist = {r["k"]: r["n_rows"] for r in key_histogram(df, "k").collect()}
    assert hist[0] == 9_000
    assert sum(hist.values()) == 10_000


def test_histogram_is_single_exchange_with_partial_agg(spark):
    plan = plan_of(key_histogram(_skewed_df(spark), "k"))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    # partial aggregation below the exchange (map-side combine): the
    # tree prints final agg / exchange / partial agg top-down
    assert tree.count("HashAggregate") == 2
    assert tree.index("HashAggregate") < tree.index("Exchange")


def test_report_flags_the_hot_key(spark):
    rep = skew_report(_skewed_df(spark), "k", top_n=5)
    assert rep.n_rows == 10_000
    assert rep.n_keys == 101
    assert rep.max == 9_000
    assert rep.top_keys[0] == (0, 9_000)
    assert len(rep.top_keys) == 5
    assert rep.is_skewed()
    # mean ~ 99, max 9000 -> factor ~ 91
    assert 80 < rep.skew_factor < 100


def test_uniform_keys_need_no_salt(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 64).alias("k"), F.col("id").alias("v")
    )
    rep = skew_report(df, "k")
    assert not rep.is_skewed()
    assert suggest_salt_buckets(rep, parallelism=32) == 1


def test_suggested_salt_caps_at_parallelism(spark):
    rep = skew_report(_skewed_df(spark), "k")
    b = suggest_salt_buckets(rep, parallelism=32)
    assert b == 32  # max/mean ~ 91, capped
    assert suggest_salt_buckets(rep, parallelism=256) == 91


def test_suggested_salt_feeds_topk_identically(spark):
    """End-to-end: report -> salt suggestion -> salted top-k equals
    the unsalted result (the equivalence the suggestion relies on)."""
    df = _skewed_df(spark, n=2_000)
    b = suggest_salt_buckets(skew_report(df, "k"), parallelism=8)
    assert b > 1
    salted = topk_per_key(df, ["k"], ["v"], k=3, salt_buckets=b)
    plain = topk_per_key(df, ["k"], ["v"], k=3)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_scan_partition_histogram_sums_to_count(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from dax_ppdb_spark.ops.skew import scan_partition_histogram

    hist = scan_partition_histogram(docs).collect()
    assert sum(r["n_rows"] for r in hist) == docs.count()
    assert all(r["n_rows"] > 0 for r in hist)


def test_estimated_size_tracks_file_size(spark, sf_dir):
    import os

    from dax_ppdb_spark.ops.skew import estimated_size_bytes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    est = estimated_size_bytes(docs)
    actual = sum(
        os.path.getsize(f.replace("file:", ""))
        for f in docs.inputFiles()
    )
    # for a bare scan the estimate is the file-size total (± metadata)
    assert 0.5 * actual <= est <= 4 * actual


def test_shuffle_partition_suggestion_bounds(spark):
    from dax_ppdb_spark.ops.skew import suggest_shuffle_partitions

    mb = 1024 * 1024
    assert suggest_shuffle_partitions(0) == 1
    assert suggest_shuffle_partitions(100 * mb) == 1
    assert suggest_shuffle_partitions(129 * mb) == 2
    # 100 TB at the default target -> 819200 capped to max
    assert suggest_shuffle_partitions(100 * 1024 * 1024 * mb) == 100_000
    assert (
        suggest_shuffle_partitions(10 * 1024 * mb, target_partition_bytes=256 * mb)
        == 40
    )


def test_multi_key_histogram(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = skew_report(docs, ["source"], top_n=3)
    assert rep.n_rows == docs.count()
    assert rep.n_keys == docs.select("source").distinct().count()
    assert len(rep.top_keys[0]) == 2  # (source, n_rows)


def test_table_stats_counts_nulls_ndv_minmax(spark):
    from dax_ppdb_spark.ops.stats import table_stats

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (3, None)], "k LONG, s STRING"
    )
    out = {r["column"]: r.asDict() for r in table_stats(df).collect()}
    assert out["k"] == {
        "column": "k", "n_rows": 4, "n_nulls": 0, "n_distinct": 3,
        "min_value": "1", "max_value": "3",
    }
    assert out["s"] == {
        "column": "s", "n_rows": 4, "n_nulls": 2, "n_distinct": 2,
        "min_value": "a", "max_value": "b",
    }


def test_table_stats_empty_and_allnull(spark):
    from dax_ppdb_spark.ops.stats import table_stats

    empty = spark.createDataFrame([], "k LONG")
    row = table_stats(empty).collect()[0]
    assert (row.n_rows, row.n_nulls, row.n_distinct) == (0, 0, 0)
    assert row.min_value is None and row.max_value is None

    allnull = spark.createDataFrame([(None,), (None,)], "k STRING")
    row = table_stats(allnull).collect()[0]
    assert (row.n_rows, row.n_nulls, row.n_distinct) == (2, 2, 0)
    assert row.min_value is None


def test_table_stats_approx_lane_matches_exact_at_small_n(spark):
    """HLL++ is exact below its sparse-mode threshold, so the approx
    lane (the 100-TB default: no k-way Expand) returns the same NDV on
    a small distinct set."""
    from dax_ppdb_spark.ops.stats import table_stats

    df = spark.createDataFrame([(i % 7, str(i % 3)) for i in range(50)], "k LONG, s STRING")
    exact = {r["column"]: r.n_distinct for r in table_stats(df).collect()}
    approx = {r["column"]: r.n_distinct for r in table_stats(df, approx=True).collect()}
    assert exact == {"k": 7, "s": 3}
    assert approx == exact


def test_column_histograms_disc_semantics_and_ties(spark):
    """Hand-checked ANSI PERCENTILE_DISC golden, 4 buckets over
    1..8: cuts are the actual data values at CDF >= {.25,.5,.75}
    (2, 4, 6), ties go LOW (a value equal to a cut closes that cut's
    bucket), every bucket reports its true (lo, hi, count), and the
    counts sum back to n."""
    from dax_ppdb_spark.ops.stats import column_histograms

    df = spark.createDataFrame([(float(i),) for i in range(1, 9)], "x DOUBLE")
    rows = {
        r.bucket: (r.lo, r.hi, r.n_rows)
        for r in column_histograms(df, ["x"], buckets=4).collect()
    }
    assert rows == {
        0: (1.0, 2.0, 2),   # <= cut 2
        1: (3.0, 4.0, 2),   # (2, 4]
        2: (5.0, 6.0, 2),   # (4, 6]
        3: (7.0, 8.0, 2),   # (6, 8]
    }


def test_column_histograms_constant_nulls_and_skew(spark):
    """Degenerate shapes: a constant column lands entirely in bucket
    0; NULLs are excluded from counts; an all-NULL column emits no
    rows; a heavily-duplicated value keeps PERCENTILE_DISC semantics
    (cuts repeat the dominant value, so its whole mass stays in one
    bucket)."""
    from dax_ppdb_spark.ops.stats import column_histograms

    df = spark.createDataFrame(
        [(5.0, None if i % 2 else float(i), None) for i in range(6)],
        "c DOUBLE, s DOUBLE, z DOUBLE",
    )
    out = column_histograms(df, ["c", "s", "z"], buckets=4).collect()
    by_col = {}
    for r in out:
        by_col.setdefault(r["column"], []).append(r)
    assert [(r.bucket, r.n_rows) for r in by_col["c"]] == [(0, 6)]
    assert sum(r.n_rows for r in by_col["s"]) == 3  # NULLs excluded
    assert "z" not in by_col  # all-NULL: no rows

    skew = spark.createDataFrame(
        [(1.0,)] * 97 + [(2.0,), (3.0,), (4.0,)], "x DOUBLE"
    )
    rows = {
        r.bucket: r.n_rows
        for r in column_histograms(skew, ["x"], buckets=4).collect()
    }
    # every cut is 1.0 (CDF(1.0) = .97 >= all ps): mass in bucket 0,
    # the three outliers all sit above the last cut
    assert rows == {0: 97, 3: 3}


def test_column_histograms_approx_lane_close_at_small_n(spark):
    """The Greenwald-Khanna lane (100-TB default) agrees with the
    exact lane on a small corpus at full accuracy: same buckets, same
    counts."""
    from dax_ppdb_spark.ops.stats import column_histograms

    df = spark.createDataFrame([(float(i % 37),) for i in range(200)], "x DOUBLE")
    exact = sorted(
        (r.bucket, r.lo, r.hi, r.n_rows)
        for r in column_histograms(df, ["x"], buckets=8).collect()
    )
    approx = sorted(
        (r.bucket, r.lo, r.hi, r.n_rows)
        for r in column_histograms(df, ["x"], buckets=8, approx=True).collect()
    )
    assert exact == approx


def test_column_histograms_ranges_param_matches_scan(spark):
    """Caller-provided ranges (the parquet-footer lane) only ROUTE
    values to coarse cells — the output is identical to the
    scan-derived-ranges run even when the provided range is wider
    than the data."""
    from dax_ppdb_spark.ops.stats import column_histograms

    df = spark.createDataFrame([(float(i),) for i in range(50)], "x DOUBLE")
    a = sorted(map(tuple, column_histograms(df, ["x"], buckets=4).collect()))
    b = sorted(
        map(
            tuple,
            column_histograms(
                df, ["x"], buckets=4, ranges={"x": (-1000.0, 1000.0)}
            ).collect(),
        )
    )
    assert a == b


def test_rowcount_anomalies_golden_and_history_gate(spark):
    """Hand-checked z: a flat series of 10s with one 100 spike — the
    spike's trailing window is all 10s (sd 0 -> z NULL, not flagged);
    the NEXT point's window contains the spike and computes the exact
    textbook z from integer sums; early rows below min_history are
    unscored; is_anomaly is never NULL."""
    from dax_ppdb_spark.ops.stats import rowcount_anomalies

    rows = [(i, 10) for i in range(8)] + [(8, 100), (9, 10)]
    counts = spark.createDataFrame(rows, "bucket_id LONG, n_rows LONG")
    out = {
        r.bucket_id: (r.z, r.is_anomaly)
        for r in rowcount_anomalies(
            counts, "bucket_id", window=4, min_history=4, z_thresh=3.0
        ).collect()
    }
    for i in range(4):  # < min_history
        assert out[i] == (None, False)
    for i in range(4, 8):  # flat history: sd = 0 -> unscored
        assert out[i] == (None, False)
    assert out[8] == (None, False)  # spike itself: trailing sd = 0
    # bucket 9: window = [10, 10, 10, 100]; mean 32.5, var 2025, sd 45
    assert out[9] == (-0.5, False)
    # none NULL
    assert all(a is not None for _, (_, a) in out.items())


def test_rowcount_anomalies_flags_spike(spark):
    """A spike against a NOISY history (nonzero sd) gets a large
    positive z and the flag."""
    from dax_ppdb_spark.ops.stats import rowcount_anomalies

    rows = [(i, 10 + (i % 2)) for i in range(8)] + [(8, 1000)]
    counts = spark.createDataFrame(rows, "bucket_id LONG, n_rows LONG")
    out = {r.bucket_id: r for r in rowcount_anomalies(
        counts, "bucket_id", window=8, min_history=4
    ).collect()}
    assert out[8].is_anomaly is True and out[8].z > 100
