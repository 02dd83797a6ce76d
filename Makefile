# Developer / pre-snapshot gates.  `make check` is the full gate run
# before every end-of-round commit: the Spark-vs-DuckDB oracle
# selfcheck against the REAL testdata — the FULL query registry,
# superset of the external driver's 50-query window (catches
# physical-schema drift in regenerated parquet — the round-2 failure
# mode — AND regressions in rotation-tailed queries), the unit suite,
# a bench smoke that proves bench.py exits 0 and prints its JSON, and
# the scale-growth gate for the historically superlinear plans.

SF_SMALL ?= /root/testdata/sf0.01
SF_BENCH ?= /root/testdata/sf0.1
PYTEST ?= python -m pytest
# bench.py's JSON must appear AND bench.py itself must exit 0 — without
# pipefail, grep's success would mask a crash after the JSON printed.
SHELL := /bin/bash
.SHELLFLAGS := -o pipefail -c

.PHONY: check selfcheck selfcheck-bench selfcheck-tail test bench-smoke bench scale-smoke

check: selfcheck selfcheck-bench test bench-smoke scale-smoke

selfcheck:
	python tools/selfcheck.py $(SF_SMALL)

# The FULL registry at the DRIVER's scale (promoted from tail-only in
# round 12): a corpus-derived threshold (auto_bands & co) that only
# crosses at sf0.1 would otherwise regress with no net under it until
# the query's external round comes back around — and a HEAD query
# with a scale-dependent bug previously had no sf0.1 net between the
# commit and the driver's own run.  Wall-clock cost is dominated by
# the DuckDB side replaying the quadratic-SQL oracles (timed in
# BASELINE.md, "Gate cost"); the tail-only leg remains for quick
# iteration.
selfcheck-bench:
	python tools/selfcheck.py $(SF_BENCH)

selfcheck-tail:
	python tools/selfcheck.py $(SF_BENCH) --tail

test:
	$(PYTEST) tests/ -q

bench-smoke:
	SPARK_GRAFT_SF_DIR=$(SF_SMALL) python bench.py 2>&1 | grep -o '{"metric".*}'

bench:
	python bench.py 2>&1 | grep -o '{"metric".*}'

scale-smoke:
	python tools/scale_smoke.py 4 $(SF_BENCH)
