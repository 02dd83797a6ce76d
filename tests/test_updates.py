"""Updates pipeline tests, mirroring the reference's fixtures.

Seed data shape: ``python/lsst/dax/ppdb/tests/_updates.py:36-153``
(all 6 record types + same-key newer/older records pinning
last-writer-wins); merge semantics:
``tests/test_updates_merger.py:97-243`` (untouched-row checks,
reassign-to-SSObject nulling diaObjectId).
"""

from __future__ import annotations

import json

import pytest

from dax_ppdb_spark.ops.updates import (
    apply_update_patches,
    build_patch,
    expand_updates,
    latest_updates,
    validate_update_targets,
)

T0 = 1640995200000000000  # 2022-01-01 in ns
MJD = 59580.0


def _raw_updates(spark, chunk=0):
    rows = [
        # (time_ns, order, type, payload)
        (T0, 0, "reassign_diasource_to_diaobject",
         {"diaSourceId": 100001, "diaObjectId": 300001}),
        (T0, 1, "reassign_diasource_to_ssobject",
         {"diaSourceId": 100002, "ssObjectId": 2001, "ssObjectReassocTimeMjdTai": MJD}),
        (T0, 2, "withdraw_diasource",
         {"diaSourceId": 100003, "timeWithdrawnMjdTai": MJD}),
        (T0, 3, "withdraw_diaforcedsource",
         {"diaObjectId": 200001, "visit": 12345, "detector": 42,
          "timeWithdrawnMjdTai": MJD}),
        (T0, 4, "close_diaobject_validity",
         {"diaObjectId": 200001, "validityEndMjdTai": MJD, "nDiaSources": 5}),
        (T0, 5, "update_ndiasources", {"diaObjectId": 200002, "nDiaSources": 10}),
        # Same source reassigned again 1s later -> wins.
        (T0 + 10**9, 0, "reassign_diasource_to_diaobject",
         {"diaSourceId": 100001, "diaObjectId": 400001}),
        # Older duplicate of the nDiaSources update -> discarded.
        (T0 - 10**9, 5, "update_ndiasources", {"diaObjectId": 200002, "nDiaSources": 8}),
    ]
    return spark.createDataFrame(
        [(chunk, t, o, ty, json.dumps(p)) for t, o, ty, p in rows],
        "apdb_replica_chunk LONG, update_time_ns LONG, update_order LONG, "
        "update_type STRING, json_payload STRING",
    )


def test_expand_counts_and_keys(spark):
    expanded = expand_updates(_raw_updates(spark))
    rows = expanded.collect()
    # 1 + 3 + 1 + 1 + 2 + 1 + 1 + 1 field rows
    assert len(rows) == 11
    by_key = {(r.table_name, r.record_key, r.field_name, r.update_time_ns) for r in rows}
    assert ("DiaSource", "100002", "diaObjectId", T0) in by_key  # forced NULL row
    fs = [r for r in rows if r.table_name == "DiaForcedSource"]
    assert fs[0].record_id == [200001, 12345, 42]
    assert fs[0].record_key == "200001-12345-42"


def test_latest_only_tiebreak(spark):
    latest = latest_updates(expand_updates(_raw_updates(spark)))
    reassign = latest.filter(
        (latest.table_name == "DiaSource")
        & (latest.record_key == "100001")
        & (latest.field_name == "diaObjectId")
    ).collect()
    assert len(reassign) == 1
    assert json.loads(reassign[0].value_json) == 400001
    nsrc = latest.filter(
        (latest.table_name == "DiaObject")
        & (latest.record_key == "200002")
        & (latest.field_name == "nDiaSources")
    ).collect()
    assert len(nsrc) == 1 and nsrc[0].value_json == "10"


def test_chunk_precedence_over_time(spark):
    """Higher chunk id wins even with an older timestamp (W3 key order)."""
    import json as _json

    rows = [
        (1, T0 + 10**9, 0, "update_ndiasources",
         _json.dumps({"diaObjectId": 1, "nDiaSources": 5})),
        (2, T0, 0, "update_ndiasources",
         _json.dumps({"diaObjectId": 1, "nDiaSources": 7})),
    ]
    raw = spark.createDataFrame(
        rows,
        "apdb_replica_chunk LONG, update_time_ns LONG, update_order LONG, "
        "update_type STRING, json_payload STRING",
    )
    latest = latest_updates(expand_updates(raw))
    assert latest.collect()[0].value_json == "7"


def test_build_patch_pivot(spark):
    latest = latest_updates(expand_updates(_raw_updates(spark)))
    patch = build_patch(latest, "DiaSource")
    by_id = {r.diaSourceId: r for r in patch.collect()}
    assert set(by_id) == {100001, 100002, 100003}
    r2 = by_id[100002]
    assert r2.ssObjectId == 2001 and r2.ssObjectId__present
    assert r2.diaObjectId is None and r2.diaObjectId__present  # forced NULL
    assert r2.timeWithdrawnMjdTai is None and not r2.timeWithdrawnMjdTai__present
    r1 = by_id[100001]
    assert r1.diaObjectId == 400001 and r1.diaObjectId__present


def test_apply_patches_end_to_end(spark):
    latest = latest_updates(expand_updates(_raw_updates(spark)))
    dia_source = spark.createDataFrame(
        [
            (100001, 300000, None, None, None),
            (100002, 300002, None, None, None),
            (100003, 300003, None, None, None),
            (100009, 300009, None, None, None),  # untouched
        ],
        "diaSourceId LONG, diaObjectId LONG, ssObjectId LONG, "
        "ssObjectReassocTimeMjdTai DOUBLE, timeWithdrawnMjdTai DOUBLE",
    )
    dia_object = spark.createDataFrame(
        [(200001, 59500.0, None, 3), (200002, 59500.0, None, 4), (200009, 59500.0, None, 9)],
        "diaObjectId LONG, validityStartMjdTai DOUBLE, validityEndMjdTai DOUBLE, "
        "nDiaSources INT",
    )
    dia_forced = spark.createDataFrame(
        [(200001, 12345, 42, None), (200001, 12346, 42, None)],
        "diaObjectId LONG, visit LONG, detector LONG, timeWithdrawnMjdTai DOUBLE",
    )
    out = apply_update_patches(
        {"DiaObject": dia_object, "DiaSource": dia_source, "DiaForcedSource": dia_forced},
        latest,
    )
    src = {r.diaSourceId: r for r in out["DiaSource"].collect()}
    assert src[100001].diaObjectId == 400001
    assert src[100002].diaObjectId is None  # nulled by SSObject reassign
    assert src[100002].ssObjectId == 2001
    assert src[100002].ssObjectReassocTimeMjdTai == MJD
    assert src[100003].timeWithdrawnMjdTai == MJD
    assert src[100009].diaObjectId == 300009  # untouched row unchanged

    obj = {r.diaObjectId: r for r in out["DiaObject"].collect()}
    assert obj[200001].validityEndMjdTai == MJD and obj[200001].nDiaSources == 5
    assert obj[200002].nDiaSources == 10
    assert obj[200009].nDiaSources == 9

    forced = {(r.diaObjectId, r.visit, r.detector): r for r in out["DiaForcedSource"].collect()}
    assert forced[(200001, 12345, 42)].timeWithdrawnMjdTai == MJD
    assert forced[(200001, 12346, 42)].timeWithdrawnMjdTai is None


def test_validate_missing_targets(spark):
    latest = latest_updates(expand_updates(_raw_updates(spark)))
    patch = build_patch(latest, "DiaSource")
    target = spark.createDataFrame([(100001,)], "diaSourceId LONG")
    missing = validate_update_targets(target, patch, ("diaSourceId",)).collect()
    assert sorted(r.diaSourceId for r in missing) == [100002, 100003]


def test_latest_only_agg_matches_window_form(spark):
    """The max_by aggregation form and the row_number window form pick
    the same winners (ordering tuples unique by construction)."""
    import random

    from dax_ppdb_spark.ops.latest import latest_only, latest_only_agg

    rng = random.Random(7)
    rows = [
        (rng.randint(1, 20), rng.randint(0, 30), i, f"v{i}")
        for i in range(300)
    ]  # i makes the (t, i) ordering tuple unique
    df = spark.createDataFrame(rows, "k LONG, t LONG, o LONG, v STRING")
    a = {(r.k, r.t, r.o, r.v) for r in latest_only(df, ["k"], ["t", "o"]).collect()}
    b = {(r.k, r.t, r.o, r.v) for r in latest_only_agg(df, ["k"], ["t", "o"]).collect()}
    assert a == b and len(a) == df.select("k").distinct().count()


def test_latest_only_agg_partial_aggregates(spark):
    """The plan must show a two-phase hash aggregate (partial_maxby
    before the exchange) — the reason this form wins at scale."""
    from dax_ppdb_spark.ops.latest import latest_only_agg

    df = spark.range(100).selectExpr("id % 5 AS k", "id AS t", "id AS o", "CAST(id AS STRING) AS v")
    out = latest_only_agg(df, ["k"], ["t", "o"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2 or "partial" in plan.lower()


def test_topk_per_key_salted_matches_direct(spark):
    """Two-phase salted top-k == direct window top-k (winners unique
    by construction), with bounded second-phase partitions."""
    import random

    from dax_ppdb_spark.ops.latest import topk_per_key

    rng = random.Random(11)
    # heavy skew: 90% of rows on key 1
    rows = [
        (1 if rng.random() < 0.9 else rng.randint(2, 10), i, f"v{i}")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k LONG, t LONG, v STRING")
    direct = {(r.k, r.t) for r in topk_per_key(df, ["k"], ["t"], k=3).collect()}
    salted = {
        (r.k, r.t)
        for r in topk_per_key(df, ["k"], ["t"], k=3, salt_buckets=8).collect()
    }
    assert salted == direct
    assert len([1 for k, _t in direct if k == 1]) == 3


def test_merge_observation_counts(spark):
    """DML stats ride the action that materializes the merge
    (updates_manager.py:242-271 analog): scanned/updated/inserted
    counts for a known batch, with no extra scan jobs."""
    from dax_ppdb_spark import metrics
    from dax_ppdb_spark.ops.merge import merge_patch, merge_upsert

    metrics.clear()
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id LONG, v STRING"
    )
    patch = spark.createDataFrame([(2, "B"), (4, "D")], "id LONG, v STRING")
    merged = merge_patch(target, patch, ["id"], observe_as="patch_stage")
    merged.count()  # the action the observation rides
    [entry] = metrics.flush_observations()
    assert entry["stage"] == "patch_stage" and entry["op"] == "merge_patch"
    assert entry["rows"] == 4 and entry["updated"] == 2
    assert metrics.recent("patch_stage", kind="dml")

    upsert_patch = spark.createDataFrame([(4, "DD"), (9, "Z")], "id LONG, v STRING")
    up = merge_upsert(target, upsert_patch, ["id"], observe_as="upsert_stage")
    up.count()
    [entry] = metrics.flush_observations()
    assert entry["updated"] == 1 and entry["inserted"] == 1 and entry["rows"] == 5


def test_assert_update_targets_raises_on_missing(spark):
    """The reference's rowcount==1 hard error (sql/_ppdb_sql.py:347-350):
    a patch aimed at an absent record must raise, valid batches pass."""
    import pytest as _pytest

    from dax_ppdb_spark.ops.updates import assert_update_targets

    latest = latest_updates(expand_updates(_raw_updates(spark)))
    patch = build_patch(latest, "DiaSource")
    good_target = spark.createDataFrame(
        [(100001,), (100002,), (100003,)], "diaSourceId LONG"
    )
    assert_update_targets(good_target, patch, ("diaSourceId",))  # no raise

    bad_target = spark.createDataFrame([(100001,)], "diaSourceId LONG")
    with _pytest.raises(ValueError, match="100002"):
        assert_update_targets(bad_target, patch, ("diaSourceId",))


def test_funnel_semantics(spark):
    """Step order is enforced strictly: purchases before the click
    don't count, broken funnels leave later steps NULL, same-timestamp
    events don't chain."""
    from dax_ppdb_spark.ops.funnel import funnel

    rows = [
        # user 1: full funnel in order
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # user 2: purchase BEFORE click -> funnel stops at click
        (2, "view", 100), (2, "purchase", 150), (2, "click", 200),
        # user 3: click only -> zero steps (no view)
        (3, "click", 100),
        # user 4: same-timestamp click doesn't chain off the view
        (4, "view", 100), (4, "click", 100),
        # user 5: multiple candidates -> earliest valid chain
        (5, "view", 50), (5, "view", 10), (5, "click", 30), (5, "click", 60),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, event_type STRING, ts_us LONG")
    out = {r.user_id: r for r in funnel(df, ("view", "click", "purchase")).collect()}
    assert out[1].steps_completed == 3 and out[1].ts3_us == 300
    assert out[2].steps_completed == 2 and out[2].ts3_us is None
    assert out[3].steps_completed == 0
    assert out[4].steps_completed == 1 and out[4].ts2_us is None
    # earliest view at 10, earliest click after it at 30
    assert (out[5].ts1_us, out[5].ts2_us) == (10, 30)
