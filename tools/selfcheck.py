"""Self-check harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and a STRICT value hash after the driver's
canonicalization (columns sorted by name, rows sorted by all columns;
floats rounded to 9 decimals — calibrated to the driver's hash, see
``_value_hash`` — everything else repr-exact.  The old 1e-9-RELATIVE
tolerant compare masked the CORRECTNESS_r05 failure classes).  Oracle-less queries
still go through canonicalization so driver-crashing outputs (e.g.
unsortable ``array`` columns) fail HERE first.

Usage: python tools/selfcheck.py [sf_dir] [--repeat N] [--tail] [query ...]

``--repeat N`` re-runs each Spark query N times and fails if the
canonical hash differs between runs — the net for order-sensitive
float aggregations (shuffle-merge order flakes).

``--tail`` restricts to the rotation tail (``_VERIFY_TAIL``) — the
queries outside the driver's 50-row external window this round.  The
`make check` gate runs this subset at the DRIVER's scale (sf0.1): a
scale-dependent regression in a tailed query (a corpus-derived
banding/threshold crossing that only manifests at sf0.1) would
otherwise have no net under it until its external round comes up.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from dax_ppdb_spark.session import TABLES, get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization: columns sorted by name, rows
    sorted by every column.  Raises (like the driver does) on
    unsortable cell types such as lists.

    Float columns are rounded to the hash precision BEFORE the row
    sort: two rows whose scores differ only in the last ulp between
    engines would otherwise sort in different orders and fail the
    hash even though every rounded value matches (row order feeds the
    hash)."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    """Value hash over the canonical frame's stringified cells.

    Float columns hash after rounding to 9 decimal places — calibrated
    to the driver's OBSERVED hash behavior: the r5 covariance flip at
    the 6th decimal failed the driver's hash, while lm_score's
    last-ulp cross-engine sum noise (1e-13-scale, including values
    straddling a 1e-12 rounding boundary) passes it every round.
    Round-9 catches every real mismatch class — rounding-boundary
    flips at the query's own round-6, -0.0 vs 0.0 (numpy round
    preserves the sign of zero), count/key drift — without
    false-alarming on the final ulps of an associativity-dependent
    double sum.  Everything else hashes via exact repr.
    """
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        vals = df[c]
        if str(vals.dtype).startswith("float"):
            vals = vals.round(9)
        for v in vals.tolist():
            h.update(repr(v).encode())
            h.update(b"\x00")
    return h.hexdigest()


def main() -> int:
    argv = sys.argv[1:]
    repeat = 1
    if "--repeat" in argv:
        i = argv.index("--repeat")
        repeat = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    tail_only = "--tail" in argv
    if tail_only:
        argv.remove("--tail")
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    only = set(argv[1:]) if argv and os.path.isdir(argv[0]) else set(argv)
    # Lazily-resolved oracles (size-derived SQL) must see the same
    # corpus the views below read.
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # Full registry incl. the driver-folded twins: folding a query out
    # of the external window must never drop it from the internal gate.
    from dax_ppdb_spark import driver_queries

    qs = driver_queries.all_queries()
    oracles = driver_queries.all_oracle_sql()
    if tail_only:
        tail = set(driver_queries._VERIFY_TAIL)
        qs = {n: f for n, f in qs.items() if n in tail}
    if only:
        qs = {n: f for n, f in qs.items() if n in only}

    # Pipeline the DuckDB side against the Spark side: every oracle is
    # a pure SELECT over the views above (no dependence on Spark-side
    # side effects; the lazily-resolved SQL strings were already built
    # by all_oracle_sql() in THIS thread), so a single worker thread
    # runs them in registry order while the main thread runs Spark —
    # wall-clock drops from sum(spark)+sum(duckdb) toward the max of
    # the two (measured 23.4 -> 16.6 min for the full registry at
    # sf0.1 — short of the ideal max() because the engines contend
    # for the same 32 cores while overlapped).
    # DuckDB releases the GIL during execution; the worker uses its
    # own cursor (same database, sees the views).  Results/errors are
    # consumed in order, so output and failure semantics are
    # unchanged.
    from concurrent.futures import ThreadPoolExecutor

    ocon = con.cursor()

    def _run_oracle(sql: str) -> pd.DataFrame:
        return ocon.execute(sql).df()

    pool = ThreadPoolExecutor(max_workers=1)
    oracle_futs = {
        name: pool.submit(_run_oracle, oracles[name])
        for name in qs
        if name in oracles
    }
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        hashes: list[str] = []
        sdf_canon = None
        err = None
        for r in range(repeat):
            try:
                raw = fn(spark, sf_dir).toPandas()
                sdf_canon = _canon(raw)
                hashes.append(_value_hash(sdf_canon))
            except Exception as e:  # spark error OR canon crash (driver parity)
                err = e
                break
        t_spark = time.time() - t0
        if err is not None:
            print(f"FAIL  {name}: spark/canon error: {err!r}")
            failures += 1
            continue
        if len(set(hashes)) > 1:
            print(f"FAIL  {name}: UNSTABLE across {repeat} runs (order-sensitive)")
            failures += 1
            continue
        if name not in oracles:
            print(
                f"ROWS  {name}: {len(sdf_canon)} rows, canon ok (no oracle)"
                f"  [{t_spark:.1f}s]"
            )
            continue
        try:
            # pop(): the single DuckDB worker usually outruns Spark, so
            # holding every finished result frame in the dict would grow
            # peak memory toward the sum of all oracle outputs; dropping
            # the future after its compare keeps it one-at-a-time.
            odf = _canon(oracle_futs.pop(name).result())
        except Exception as e:
            print(f"FAIL  {name}: duckdb/canon error: {e!r}")
            failures += 1
            continue
        a, b = sdf_canon, odf
        if sorted(a.columns) != sorted(b.columns):
            print(f"FAIL  {name}: columns {sorted(a.columns)} vs {sorted(b.columns)}")
            failures += 1
        elif len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            failures += 1
        elif hashes[0] != _value_hash(b):
            print(f"FAIL  {name}: value-hash mismatch (exact compare)")
            mask = ~(a.astype(str).values == b.astype(str).values).all(axis=1)
            print(a[mask].head(5))
            print(b[mask].head(5))
            failures += 1
        else:
            tag = f" x{repeat}" if repeat > 1 else ""
            print(f"OK    {name}: {len(a)} rows{tag}  [{t_spark:.1f}s]")
    pool.shutdown(wait=False, cancel_futures=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
