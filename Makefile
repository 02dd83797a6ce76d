# Developer / pre-snapshot gates.  `make check` is the full gate run
# before every end-of-round commit: the Spark-vs-DuckDB oracle
# selfcheck against the REAL testdata (catches physical-schema drift
# in regenerated parquet — the round-2 failure mode), the unit suite,
# and a bench smoke that proves bench.py exits 0 and prints its JSON.

SF_SMALL ?= /root/testdata/sf0.01
PYTEST ?= python -m pytest

.PHONY: check selfcheck test bench-smoke bench

check: selfcheck test bench-smoke

selfcheck:
	python tools/selfcheck.py $(SF_SMALL)

test:
	$(PYTEST) tests/ -q

bench-smoke:
	SPARK_GRAFT_SF_DIR=$(SF_SMALL) python bench.py 2>&1 | grep -o '{"metric".*}'

bench:
	python bench.py 2>&1 | grep -o '{"metric".*}'
