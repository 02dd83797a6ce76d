"""Property-based invariants for the round-4 LLM-data operators.

Brute-force replays in plain Python over adversarial random inputs —
the same pinning style as test_join_props, complementing the fixed
DuckDB oracle tables.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

vecs = st.lists(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ),
    min_size=1,
    max_size=8,
)

words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
texts = st.lists(
    st.lists(words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(**SETTINGS)
@given(data=vecs)
def test_quantize_int8_error_bound_and_code_range(spark, data):
    """Reconstruction error can never exceed the quantization step:
    |x - q*scale| <= scale/2 off the clamp boundary and <= scale at
    it, so rmse <= scale; codes stay in [-127, 127]; the zero vector
    round-trips exactly."""
    from dax_ppdb_spark.llm.embeddings import quantize_int8

    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    for r in quantize_int8(emb).collect():
        assert r.qnorm_sq <= 127 * 127 * r.dim
        # rmse is rounded to 6 decimals; scale is exact
        assert r.rmse <= r.scale + 1e-6
        if r.scale == 0.0:
            assert r.rmse == 0.0 and r.qnorm_sq == 0


@settings(**SETTINGS)
@given(data=texts)
def test_dup_spans_matches_bruteforce(spark, data):
    """n_dup / max_run / dup_frac agree with a plain-Python replay of
    the definition (5-gram doc frequency >= 2, longest consecutive
    duplicated run)."""
    from dax_ppdb_spark.llm.dedup import duplicated_span_stats

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(data)], "doc_id LONG, text STRING"
    )
    n = 5
    grams = {
        i: [
            tuple(t.split()[j : j + n])
            for j in range(len(t.split()) - n + 1)
        ]
        for i, t in enumerate(data)
    }
    df = {}
    for i, gs in grams.items():
        for g in set(gs):
            df[g] = df.get(g, 0) + 1
    expected = {}
    for i, gs in grams.items():
        if not gs:
            continue
        flags = [df[g] >= 2 for g in gs]
        runs, cur = [0], 0
        for f in flags:
            cur = cur + 1 if f else 0
            runs.append(cur)
        expected[i] = (len(gs), sum(flags), max(runs))
    got = {
        r.doc_id: (r.n_grams, r.n_dup, r.max_run, r.dup_frac)
        for r in duplicated_span_stats(docs, n=n).collect()
    }
    assert set(got) == set(expected)
    for i, (ng, nd, mr) in expected.items():
        g = got[i]
        assert g[:3] == (ng, nd, mr)
        assert math.isclose(g[3], round(nd / ng, 6), abs_tol=1e-9)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["x", "y"])),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    ),
    k=st.integers(1, 4),
)
def test_exact_stratified_k_invariants(spark, rows, k):
    """Per-stratum output is min(k, stratum size); ranks are 1..m with
    no gaps; every output row exists in the input."""
    from dax_ppdb_spark.llm.sampling import exact_stratified_k

    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    out = exact_stratified_k(df, ["lang"], k=k).collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r.lang, []).append(r.rank)
    sizes = {}
    for _, lang in rows:
        sizes[lang] = sizes.get(lang, 0) + 1
    for lang, ranks in by_stratum.items():
        assert sorted(ranks) == list(range(1, min(k, sizes[lang]) + 1))
    in_ids = {r[0] for r in rows}
    assert all(r.doc_id in in_ids for r in out)
