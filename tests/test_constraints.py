"""Data-quality constraint tests: audit counts, row-level listings,
ANSI-CHECK NULL semantics, FK null-skip, unique excess counting, and
the fused-single-scan plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dax_ppdb_spark.ops.constraints import (
    AcceptedValues,
    Check,
    ForeignKey,
    InRange,
    NotNull,
    Unique,
    constraint_audit,
    constraint_violations,
)


@pytest.fixture()
def child(spark):
    # id, fk, status, score
    rows = [
        (1, 10, "A", 5.0),
        (2, 10, "B", -1.0),   # score out of range
        (3, None, "C", 2.0),  # fk null (skipped by FK), status not accepted
        (4, 99, "A", None),   # fk orphan, score null (passes range: UNKNOWN)
        (5, 11, "A", 3.0),
        (5, 11, "A", 4.0),    # duplicate id=5
        (5, 12, None, 0.0),   # triplicate id=5; status null passes accepted
    ]
    return spark.createDataFrame(
        rows, "id int, fk int, status string, score double"
    )


@pytest.fixture()
def parent(spark):
    return spark.createDataFrame([(10,), (11,), (12,)], "pk int")


def _rules(parent):
    return [
        NotNull("fk"),
        AcceptedValues("status", ("A", "B")),
        InRange("score", 0.0, 10.0),
        Check("score_below_id", "score < id"),
        Unique(("id",)),
        ForeignKey(("fk",), parent, ("pk",), "child_fk"),
    ]


def test_audit_counts(spark, child, parent):
    got = {
        r["rule"]: (r["n_checked"], r["n_violations"], r["passed"])
        for r in constraint_audit(child, _rules(parent)).collect()
    }
    assert got == {
        # 7 rows; one null fk
        "not_null(fk)": (7, 1, False),
        # status 'C' violates; NULL status passes (ANSI CHECK)
        "accepted_values(status)": (7, 1, False),
        # -1.0 violates; NULL score passes
        "in_range(score)": (7, 1, False),
        # score<id false for (1,5.0); NULL score UNKNOWN -> passes
        "check(score_below_id)": (7, 1, False),
        # id=5 x3 -> 2 excess rows
        "unique(id)": (7, 2, False),
        # 6 non-null-fk rows checked; fk=99 orphan
        "foreign_key(child_fk)": (6, 1, False),
    }


def test_audit_passing_rules(spark, child, parent):
    rules = [NotNull("id"), InRange("id", 0, 100), Unique(("id", "score"))]
    got = constraint_audit(child, rules).collect()
    assert all(r["passed"] for r in got)
    assert all(r["n_violations"] == 0 for r in got)


def test_violations_rows(spark, child, parent):
    got = sorted(
        (r["id"], r["rule"])
        for r in constraint_violations(child, _rules(parent), ["id"]).collect()
    )
    assert got == sorted(
        [
            (3, "not_null(fk)"),
            (3, "accepted_values(status)"),
            (2, "in_range(score)"),
            (1, "check(score_below_id)"),
            # unique flags EVERY member of the duplicated group
            (5, "unique(id)"),
            (5, "unique(id)"),
            (5, "unique(id)"),
            (4, "foreign_key(child_fk)"),
        ]
    )


def test_half_open_range_and_empty_table(spark):
    df = spark.createDataFrame([(1,), (5,)], "x int")
    got = {
        r["rule"]: r["n_violations"]
        for r in constraint_audit(df, [InRange("x", lo=2), InRange("x", hi=2)]).collect()
    }
    # both rules share one label per column; use distinct cols instead
    df2 = spark.createDataFrame([(1, 1), (5, 5)], "a int, b int")
    got = {
        r["rule"]: r["n_violations"]
        for r in constraint_audit(
            df2, [InRange("a", lo=2), InRange("b", hi=2)]
        ).collect()
    }
    assert got == {"in_range(a)": 1, "in_range(b)": 1}

    empty = spark.createDataFrame([], "x int")
    got = constraint_audit(empty, [NotNull("x"), Unique(("x",))]).collect()
    assert [(r["n_checked"], r["n_violations"], r["passed"]) for r in got] == [
        (0, 0, True),
        (0, 0, True),
    ]


def test_unique_groups_nulls_like_group_by(spark):
    df = spark.createDataFrame([(None,), (None,), (1,)], "k int")
    (row,) = constraint_audit(df, [Unique(("k",))]).collect()
    # two NULL keys form one duplicated group -> 1 excess row
    assert (row["n_checked"], row["n_violations"]) == (3, 1)


def test_composite_fk_null_any_component_skipped(spark):
    child = spark.createDataFrame(
        [(1, 1), (1, None), (2, 2)], "a int, b int"
    )
    parent = spark.createDataFrame([(1, 1)], "x int, y int")
    (row,) = constraint_audit(
        child, [ForeignKey(("a", "b"), parent, ("x", "y"), "ab")]
    ).collect()
    # (1,None) skipped; (1,1) hits; (2,2) orphan
    assert (row["n_checked"], row["n_violations"]) == (2, 1)


def test_row_rules_fused_single_scan(spark, child, parent):
    """All four row-level rules must share ONE scan of the child
    relation: k rules is one pass, not k."""
    rules = [
        NotNull("fk"),
        AcceptedValues("status", ("A", "B")),
        InRange("score", 0.0, 10.0),
        Check("score_below_id", "score < id"),
    ]
    plan = (
        constraint_audit(child, rules)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # one LocalRelation/scan feeding one Aggregate; no union of scans
    assert plan.lower().count("union") == 0


def test_violations_empty_when_clean(spark):
    df = spark.createDataFrame([(1, "A")], "id int, status string")
    out = constraint_violations(
        df, [NotNull("status"), AcceptedValues("status", ("A",))], ["id"]
    )
    assert out.count() == 0
    assert out.columns == ["id", "rule"]
