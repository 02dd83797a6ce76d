"""Measured sweep pinning ``ops.graph.connected_components``'s
local-vs-distributed threshold (``local_threshold``, default 100k
edges) — the same provenance discipline ``auto_compact_files=64`` got
(ledger_lifetime sweep): the constant's value should trace to a table
in BASELINE.md, not to a guess.

Synthetic graphs mirror the operator's real feed (LSH-capped near-dup
candidate edges): many small components — chains of ``CHAIN`` nodes —
so the star path needs its usual ~log(chain) rounds and the
single-task union-find sees the realistic many-roots shape, plus one
long chain to keep convergence honest.  For each edge count the sweep
times BOTH strategies end-to-end (result fully materialized via
count), min of ``--repeat`` runs, and prints a markdown table for
BASELINE.md.

Usage: python tools/graph_bench.py [--repeat N] [--sizes 10000,...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from dax_ppdb_spark.ops.graph import connected_components  # noqa: E402
from dax_ppdb_spark.session import get_spark  # noqa: E402

CHAIN = 8  # component size of the small-cluster population


def build_edges(spark, n_edges: int) -> DataFrame:
    """Deterministic edge set with ``n_edges`` edges: chains of
    ``CHAIN`` nodes (the LSH candidate-pair shape) plus one 1k-link
    chain so convergence takes the star path's worst realistic round
    count.  Node ids are xxhash-scattered so neither strategy gets a
    presorted gift."""
    per_chain = CHAIN - 1
    n_chains = max((n_edges - 1000) // per_chain, 1)
    small = (
        spark.range(n_chains * per_chain)
        .select(
            (F.col("id") + (F.col("id") / per_chain).cast("long")).alias("a")
        )
        .select("a", (F.col("a") + 1).alias("b"))
    )
    long_chain = spark.range(1000).select(
        (F.lit(10**12) + F.col("id")).alias("a"),
        (F.lit(10**12) + F.col("id") + 1).alias("b"),
    )
    return (
        small.unionByName(long_chain)
        .select(
            F.xxhash64("a").alias("src"),
            F.xxhash64("b").alias("dst"),
        )
        .repartition(32)
    )


def main() -> None:
    argv = sys.argv[1:]
    repeat = 2
    if "--repeat" in argv:
        i = argv.index("--repeat")
        repeat = int(argv[i + 1])
        del argv[i : i + 2]
    sizes = [10_000, 100_000, 300_000, 1_000_000, 3_000_000]
    if "--sizes" in argv:
        i = argv.index("--sizes")
        sizes = [int(s) for s in argv[i + 1].split(",")]
        del argv[i : i + 2]

    spark = get_spark("graph-bench")
    spark.sparkContext.setLogLevel("ERROR")

    print("| edges | local union-find s | star rounds s | local/star |")
    print("|---|---|---|---|")
    for n in sizes:
        edges = build_edges(spark, n).localCheckpoint(eager=True)
        times: dict[str, float] = {}
        for mode, thresh in (("local", 1 << 60), ("star", 0)):
            best = float("inf")
            for _ in range(repeat):
                t0 = time.monotonic()
                out = connected_components(edges, local_threshold=thresh)
                out.count()
                best = min(best, time.monotonic() - t0)
            times[mode] = best
        print(
            f"| {n:,} | {times['local']:.2f} | {times['star']:.2f} "
            f"| {times['local'] / times['star']:.2f} |",
            flush=True,
        )
        # localCheckpoint blocks are NOT cacheManager entries, so
        # unpersist() would be a silent no-op; the RDD's own cleanup
        # releases the checkpoint blocks when the reference drops
        # (ContextCleaner), and the sweep's handful of generations is
        # bounded either way.
        del edges


if __name__ == "__main__":
    main()
