"""Composed-pipeline parity gate: the chained curation DAG
(quality -> exact dedup -> decontaminate -> mixture -> pack) must
reach the SAME end state as a DuckDB replay of the whole chain —
per-stage output counts, not just the final frame.  The solo
operators are oracle-gated individually (tools/selfcheck.py); this
pins their COMPOSITION, where a stage contract drift (column rename,
filter pushed across a barrier) would not fail any solo check.

The full-scale run is tools/curation_bench.py (sf1-equivalent, in
BASELINE.md); this is the same code path at sf0.001 x3 so every
commit gates it.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_curation_chain_end_state_matches_duckdb(spark):
    import curation_bench

    payload = curation_bench.run(spark, "/root/testdata/sf0.001", scale=3)
    assert payload["stage_rows"] == payload["oracle_rows"], payload
    assert payload["value"] is True
    # The chain must actually filter (a pass-through chain would match
    # any oracle trivially): quality drops low scorers on this corpus,
    # and the 40% token budget guarantees the mixture stage reduces.
    rows = payload["stage_rows"]
    assert rows["quality"] >= rows["exact_dedup"] >= rows["decontaminate"]
    assert rows["decontaminate"] > rows["mixture"] > 0
    assert rows["n_shards"] >= 1
