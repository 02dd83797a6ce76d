"""Property-based invariants for the SCD-2 validity fill.

Complements the ported golden cases in test_validity.py: for arbitrary
version tables the operator must satisfy the reference's contract
(tests/test_chunk_promoter.py:469-579) —

1. explicitly-set ends are never overwritten (gap preservation);
2. a NULL end is filled with the next version's start, iff one exists;
3. the last version of every object keeps a NULL end;
4. objects outside the staged id set are untouched.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dax_ppdb_spark.ops.validity import fill_validity_end

row = st.tuples(
    st.integers(min_value=1, max_value=5),          # object id
    st.floats(min_value=0, max_value=100),           # start
    st.one_of(st.none(), st.floats(min_value=0, max_value=200)),  # preset end
)


def _unique_starts(rows):
    seen = set()
    out = []
    for oid, start, end in rows:
        if (oid, start) in seen:
            continue
        seen.add((oid, start))
        out.append((oid, float(start), None if end is None else float(end)))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row, min_size=1, max_size=20), staged=st.sets(st.integers(1, 5)))
def test_fill_invariants(spark, rows, staged):
    rows = _unique_starts(rows)
    df = spark.createDataFrame(
        rows, "oid LONG, validity_start DOUBLE, validity_end DOUBLE"
    )
    staged_df = (
        spark.createDataFrame([(s,) for s in staged], "oid LONG") if staged else None
    )
    out = fill_validity_end(
        df,
        staged_ids=staged_df,
        id_col="oid",
        start_col="validity_start",
        end_col="validity_end",
    ).collect()
    assert len(out) == len(rows)

    original = {(oid, start): end for oid, start, end in rows}
    by_obj: dict[int, list] = {}
    for oid, start, _ in rows:
        by_obj.setdefault(oid, []).append(start)
    for starts in by_obj.values():
        starts.sort()

    touched = staged if staged_df is not None else set(by_obj)
    for r in out:
        key = (r.oid, r.validity_start)
        preset = original[key]
        starts = by_obj[r.oid]
        idx = starts.index(r.validity_start)
        nxt = starts[idx + 1] if idx + 1 < len(starts) else None
        if preset is not None:
            assert r.validity_end == preset  # (1)
        elif r.oid not in touched:
            assert r.validity_end is None  # (4)
        elif nxt is not None:
            assert r.validity_end == nxt  # (2)
        else:
            assert r.validity_end is None  # (3)


latest_row = st.tuples(
    st.integers(min_value=1, max_value=4),   # key
    st.integers(min_value=0, max_value=50),  # chunk
    st.integers(min_value=0, max_value=50),  # time_ns
    st.integers(min_value=0, max_value=10),  # order
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(latest_row, min_size=1, max_size=25))
def test_latest_only_invariants(spark, rows):
    """W3 contract (expanded_updates_table.py:185-201): exactly one
    survivor per key, and it carries the lexicographically-greatest
    (chunk, time_ns, order) tuple."""
    from dax_ppdb_spark.ops.latest import latest_only

    rows = list({r: None for r in rows})  # dedup exact duplicates
    df = spark.createDataFrame(rows, "k LONG, chunk LONG, t LONG, o LONG")
    out = latest_only(df, ["k"], ["chunk", "t", "o"]).collect()
    expected = {}
    for k, c, t, o in rows:
        if k not in expected or (c, t, o) > expected[k]:
            expected[k] = (c, t, o)
    assert len(out) == len(expected)
    for r in out:
        assert (r.chunk, r.t, r.o) == expected[r.k]
