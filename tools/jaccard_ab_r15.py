"""Paired A/B for the r15 PPJoin accumulated positional filter.

Reconstructs jaccard_prefix_pairs' candidate stage in BOTH shapes —
the r14 single-entry (min-struct) bound and the r15 accumulated
(count + last-entry) bound — from one shared prefix relation, inside
ONE Spark app, and reports:

  - candidate-pair counts under each bound (new must be <= old);
  - losslessness witness: verified output rows identical;
  - paired min-of-N full-query wall clock, shapes alternated.

Usage: python tools/jaccard_ab_r15.py [sf_dir] [--repeat N]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dax_ppdb_spark.session import get_spark  # noqa: E402
from dax_ppdb_spark import driver_queries  # noqa: E402
from dax_ppdb_spark.llm.dedup import (  # noqa: E402
    _guarded_ceil,
    _rarity_prefix,
    shingles,
)
from dax_ppdb_spark.llm_queries import _read_spread  # noqa: E402

N, THRESHOLD = 3, 0.6


def _stages(docs):
    sh = (
        docs.select(
            F.col("doc_id").alias("doc_id"),
            shingles(F.col("text"), N).alias("shs"),
        )
        .localCheckpoint(eager=False)
        .filter(F.size("shs") > 0)
        .withColumn("n_sh", F.size("shs"))
    )
    inv = sh.select("doc_id", "n_sh", F.explode("shs").alias("shingle"))
    df_tbl = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    prefix = _rarity_prefix(inv, df_tbl, THRESHOLD, with_pos=True)
    members = (
        prefix.groupBy("shingle")
        .agg(
            F.first("df").alias("df"),
            F.sort_array(
                F.collect_set(F.struct("doc_id", "n_sh", "__pos"))
            ).alias("ms"),
        )
        .filter(F.size("ms") > 1)
    )
    expanded = F.explode(
        F.flatten(
            F.transform(
                "ms",
                lambda x, i: F.transform(
                    F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                    lambda y: F.struct(
                        x["doc_id"].alias("doc_a"),
                        y["doc_id"].alias("doc_b"),
                        x["n_sh"].alias("n_a"),
                        y["n_sh"].alias("n_b"),
                        x["__pos"].alias("pa"),
                        y["__pos"].alias("pb"),
                    ),
                ),
            )
        )
    )
    pairs = (
        members.select("df", "shingle", expanded.alias("p"))
        .select("df", "shingle", "p.*")
        .filter(
            F.least("n_a", "n_b")
            >= _guarded_ceil(F.greatest("n_a", "n_b") * F.lit(THRESHOLD))
        )
    )
    return sh, pairs


def _cand_old(pairs):
    first = pairs.groupBy("doc_a", "doc_b").agg(
        F.min(F.struct("df", "shingle", "pa", "pb", "n_a", "n_b")).alias("e")
    )
    alpha = _guarded_ceil(
        (F.col("e.n_a") + F.col("e.n_b")) * F.lit(THRESHOLD / (1.0 + THRESHOLD))
    )
    return first.filter(
        F.lit(1)
        + F.least(F.col("e.n_a") - F.col("e.pa"), F.col("e.n_b") - F.col("e.pb"))
        >= alpha
    ).select("doc_a", "doc_b")


def _cand_slimmin(pairs):
    # r14 bound, but the min-struct ordered by (pa, pb) alone: ranks
    # are monotone in the global (df, shingle) order, so min(pa) IS the
    # first common entry — the df + shingle STRING never needs to ride
    # the exchange.
    first = pairs.select("doc_a", "doc_b", "n_a", "n_b", "pa", "pb").groupBy(
        "doc_a", "doc_b"
    ).agg(F.min(F.struct("pa", "pb", "n_a", "n_b")).alias("e"))
    alpha = _guarded_ceil(
        (F.col("e.n_a") + F.col("e.n_b")) * F.lit(THRESHOLD / (1.0 + THRESHOLD))
    )
    return first.filter(
        F.lit(1)
        + F.least(F.col("e.n_a") - F.col("e.pa"), F.col("e.n_b") - F.col("e.pb"))
        >= alpha
    ).select("doc_a", "doc_b")


def _cand_new(pairs):
    # accumulated PPJoin bound with TWO agg buffers: count of common
    # prefix entries + the LAST entry via max(struct(pa, pb, ...)).
    grp = (
        pairs.select("doc_a", "doc_b", "n_a", "n_b", "pa", "pb")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max(F.struct("pa", "pb", "n_a", "n_b")).alias("e"),
        )
    )
    alpha = _guarded_ceil(
        (F.col("e.n_a") + F.col("e.n_b")) * F.lit(THRESHOLD / (1.0 + THRESHOLD))
    )
    return grp.filter(
        F.col("c")
        + F.least(F.col("e.n_a") - F.col("e.pa"), F.col("e.n_b") - F.col("e.pb"))
        >= alpha
    ).select("doc_a", "doc_b")


def _verify(sh, cand):
    sa = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("__sa"),
        F.col("n_sh").alias("n_a"),
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("__sb"),
        F.col("n_sh").alias("n_b"),
    )
    n_inter = F.size(F.array_intersect("__sa", "__sb"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        cand.join(sa.hint("shuffle_hash"), "doc_a")
        .join(sb.hint("shuffle_hash"), "doc_b")
        .withColumn("n_inter", n_inter)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    repeat = int(args[args.index("--repeat") + 1]) if "--repeat" in args else 3
    spark = get_spark("jaccard-ab-r15")
    spark.sparkContext.setLogLevel("ERROR")
    driver_queries.ensure_sky_sorted(spark, sf_dir)

    CANDS = {"old": _cand_old, "slim": _cand_slimmin, "new": _cand_new}

    def build(shape):
        docs = _read_spread(spark, sf_dir, "documents")
        sh, pairs = _stages(docs)
        return sh, CANDS[shape](pairs)

    shapes = ("old", "slim", "new")
    # warm all plans once
    for shape in shapes:
        sh, cand = build(shape)
        _verify(sh, cand).write.mode("overwrite").format("noop").save()

    counts = {}
    for shape in shapes:
        sh, cand = build(shape)
        counts[shape] = cand.count()
    print("candidates " + " ".join(f"{s}={counts[s]}" for s in shapes))

    outs = {}
    for shape in shapes:
        sh, cand = build(shape)
        outs[shape] = {tuple(r) for r in _verify(sh, cand).collect()}
    print("verified equal:", all(outs[s] == outs["old"] for s in shapes),
          {s: len(outs[s]) for s in shapes})

    best = {s: None for s in shapes}
    for _ in range(repeat):
        for shape in shapes:
            sh, cand = build(shape)
            q = _verify(sh, cand)
            t0 = time.time()
            q.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            if best[shape] is None or dt < best[shape]:
                best[shape] = dt
    print(
        f"paired min-of-{repeat}: "
        + " ".join(f"{s}={best[s]:.3f}s" for s in shapes)
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
