"""Bucketed-layout plan pins: the write-once-shuffle-never contract.

These are the properties a 100 TB deployment buys by bucketing the
corpus on its join key — each asserted on the PHYSICAL plan, so a
regression (Spark config drift, a refactor that loses the catalog
metadata) fails here, not in a production profile.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dax_ppdb_spark.io.bucketed import (
    bucket_spec,
    colocated,
    drop_bucketed,
    enable_sorted_bucket_scan,
    point_lookup,
    read_bucketed,
    write_bucketed,
)
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def corpus_tables(spark, sf_dir):
    """documents + a per-doc derived table, both bucketed on doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    stats = docs.select(
        "doc_id", F.length("text").alias("n_chars")
    )
    write_bucketed(docs, "bkt_docs", "doc_id", 4)
    write_bucketed(stats, "bkt_stats", "doc_id", 4)
    yield "bkt_docs", "bkt_stats"
    drop_bucketed(spark, "bkt_docs")
    drop_bucketed(spark, "bkt_stats")


def test_bucket_spec_round_trips(spark, corpus_tables):
    left, right = corpus_tables
    assert bucket_spec(spark, left) == (4, ["doc_id"])
    assert colocated(spark, left, right)


def test_colocated_join_has_no_exchange(spark, corpus_tables):
    left, right = corpus_tables
    # forbid broadcast so the join must be sort-merge — the strategy
    # bucketing accelerates; at 100 TB neither side broadcasts anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, left).join(
            read_bucketed(spark, right), "doc_id"
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        n = joined.count()
        assert n == spark.table(left).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_groupby_on_bucket_key_has_no_exchange(spark, corpus_tables):
    left, _ = corpus_tables
    agg = read_bucketed(spark, left).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = plan_of(agg)
    assert "HashAggregate" in plan
    assert "Exchange" not in plan, plan


def test_point_lookup_prunes_to_one_bucket(spark, corpus_tables):
    from dax_ppdb_spark.io.bucketed import bucket_pruned_scan

    left, _ = corpus_tables
    some_id = spark.table(left).select("doc_id").head()[0]
    rows = point_lookup(spark, left, "doc_id", some_id)
    assert len(rows) >= 1
    # a bare filter (auto-bucketed-scan left on) must still be correct
    bare = read_bucketed(spark, left).filter(F.col("doc_id") == some_id)
    assert bare.count() == len(rows)
    # pruning pin: inside the scope the scan selects exactly 1 bucket
    # (the marker only shows in the executed-plan string)
    with bucket_pruned_scan(spark):
        df = spark.table(left).filter(F.col("doc_id") == some_id)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan


def test_inlist_lookup_prunes_to_probed_buckets(spark, corpus_tables):
    from dax_ppdb_spark.io.bucketed import bucket_pruned_scan

    left, _ = corpus_tables
    ids = [r[0] for r in spark.table(left).select("doc_id").head(3)]
    rows = point_lookup(spark, left, "doc_id", ids)
    assert len(rows) == len(set(ids))
    # 3 keys hit at most 3 of the 4 buckets — never the full table
    import re

    with bucket_pruned_scan(spark):
        df = spark.table(left).filter(F.col("doc_id").isin(*ids))
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of 4", plan)
        assert m, plan
        assert 1 <= int(m.group(1)) <= 3
    # the conf is restored after the scope
    assert (
        spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        == "true"
    )


def test_mismatched_layouts_are_detected(spark, sf_dir, corpus_tables):
    left, _ = corpus_tables
    other = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    write_bucketed(other, "bkt_other", "source", 4)
    try:
        assert not colocated(spark, left, "bkt_other")
    finally:
        drop_bucketed(spark, "bkt_other")


def test_single_file_buckets_write_one_file_each(spark, sf_dir):
    import glob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    # force a many-task input; the default layout must still emit
    # exactly one file per bucket (no tasks-x-buckets explosion)
    write_bucketed(docs.repartition(7), "bkt_onefile", "doc_id", 4)
    try:
        wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
        files = glob.glob(f"{wh}/bkt_onefile/*.parquet")
        assert len(files) == 4, files
    finally:
        drop_bucketed(spark, "bkt_onefile")


def test_sorted_scan_drops_sort_for_single_file_buckets(spark, sf_dir):
    """With the sorted-bucket-scan flag and the default single-file
    layout, a co-located join is a pure merge join — no Exchange, no
    Sort.  A multi-file bucketed table must KEEP its Sort under the
    same flag (the planner's single-file proof is what makes enabling
    the flag safe)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    stats = docs.select("doc_id", F.length("source").alias("n"))
    write_bucketed(docs, "bkt_sorted_a", "doc_id", 4)
    write_bucketed(stats, "bkt_sorted_b", "doc_id", 4)
    # multi-file twin: several write tasks per bucket
    write_bucketed(
        docs.repartition(7), "bkt_multi", "doc_id", 4,
        single_file_buckets=False,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    enable_sorted_bucket_scan(spark)
    try:
        j = spark.table("bkt_sorted_a").join(spark.table("bkt_sorted_b"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Sort [" not in plan, plan
        assert j.count() == spark.table("bkt_sorted_a").count()

        j2 = spark.table("bkt_multi").join(spark.table("bkt_sorted_b"), "doc_id")
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "Sort [" in plan2, plan2  # multi-file side is not provably sorted
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
        for t in ("bkt_sorted_a", "bkt_sorted_b", "bkt_multi"):
            drop_bucketed(spark, t)


def test_register_bucketed_restores_layout(spark, sf_dir, tmp_path):
    """An external bucketed directory re-registered in a fresh catalog
    entry keeps its layout: the co-located join is still exchange-free
    and bucket_spec round-trips."""
    from dax_ppdb_spark.io.bucketed import register_bucketed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    stats = docs.select("doc_id", F.length("source").alias("n"))
    write_bucketed(docs, "reg_a", "doc_id", 4, path=str(tmp_path / "a"))
    write_bucketed(stats, "reg_b", "doc_id", 4, path=str(tmp_path / "b"))
    # simulate a fresh session: catalog entries gone, directories remain
    spark.sql("DROP TABLE reg_a")
    spark.sql("DROP TABLE reg_b")
    ra = register_bucketed(spark, "reg_a2", str(tmp_path / "a"), "doc_id", 4)
    register_bucketed(spark, "reg_b2", str(tmp_path / "b"), "doc_id", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert bucket_spec(spark, "reg_a2") == (4, ["doc_id"])
        assert colocated(spark, "reg_a2", "reg_b2")
        assert ra.count() == docs.count()
        j = spark.table("reg_a2").join(spark.table("reg_b2"), "doc_id")
        plan = plan_of(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() == docs.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        drop_bucketed(spark, "reg_a2")
        drop_bucketed(spark, "reg_b2")


def test_validate_bucketing_passes_good_and_catches_bad(spark, sf_dir, tmp_path):
    from dax_ppdb_spark.io.bucketed import register_bucketed, validate_bucketing

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    write_bucketed(docs, "val_good", "doc_id", 4, path=str(tmp_path / "v"))
    try:
        assert validate_bucketing(spark, "val_good") == docs.count()
    finally:
        spark.sql("DROP TABLE val_good")
    # same directory re-registered with a WRONG spec (different key)
    register_bucketed(spark, "val_bad", str(tmp_path / "v"), "source", 4)
    try:
        with pytest.raises(ValueError, match="wrong bucket"):
            validate_bucketing(spark, "val_bad")
    finally:
        spark.sql("DROP TABLE val_bad")
    # and a wrong bucket COUNT on the right key
    register_bucketed(spark, "val_badn", str(tmp_path / "v"), "doc_id", 8)
    try:
        with pytest.raises(ValueError, match="wrong bucket"):
            validate_bucketing(spark, "val_badn")
    finally:
        spark.sql("DROP TABLE val_badn")
    # a PLAIN parquet directory misregistered as bucketed: file names
    # carry no bucket id — must fail the audit, not crash the ANSI
    # cast on '' or silently pass via a nulled comparison
    docs.write.parquet(str(tmp_path / "plain"))
    register_bucketed(spark, "val_plain", str(tmp_path / "plain"), "doc_id", 4)
    try:
        with pytest.raises(ValueError, match="wrong bucket"):
            validate_bucketing(spark, "val_plain")
    finally:
        spark.sql("DROP TABLE val_plain")
    # a valid layout under a directory whose PATH contains a
    # bucket-id-shaped component must still validate: the id parse
    # anchors to the file basename, not the first path match
    tricky = tmp_path / "run_00001.v2" / "tbl"
    write_bucketed(docs, "val_tricky", "doc_id", 4, path=str(tricky))
    try:
        assert validate_bucketing(spark, "val_tricky") == docs.count()
    finally:
        spark.sql("DROP TABLE val_tricky")


def test_layout_properties_on_adversarial_frames(spark):
    """Property sweep: for arbitrary key distributions (dup keys, null
    payloads, negative and huge ints, single row), the written layout
    validates and the co-located self-join equals the plain join."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from dax_ppdb_spark.io.bucketed import validate_bucketing

    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows=rows_strategy, buckets=st.sampled_from([1, 3, 4]))
    def check(rows, buckets):
        df = spark.createDataFrame(rows, "k long, v string")
        write_bucketed(df, "prop_bkt", "k", buckets)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert validate_bucketing(spark, "prop_bkt") == len(rows)
            t = spark.table("prop_bkt")
            joined = t.join(t.select(F.col("k")), "k")
            plain = df.join(df.select("k"), "k")
            assert "Exchange" not in plan_of(joined)
            # None-safe sort: rows can pair a duplicate key with both
            # NULL and non-NULL payloads, and Python's tuple compare
            # raises on str-vs-None.
            nkey = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
            assert sorted(map(tuple, joined.collect()), key=nkey) == sorted(
                map(tuple, plain.collect()), key=nkey
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            drop_bucketed(spark, "prop_bkt")

    check()


def test_bucketed_join_matches_unbucketed(spark, sf_dir, corpus_tables):
    left, right = corpus_tables
    bucketed = (
        read_bucketed(spark, left)
        .join(read_bucketed(spark, right), "doc_id")
        .select("doc_id", "n_chars")
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = docs.select("doc_id").join(
        docs.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
