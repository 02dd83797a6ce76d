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
