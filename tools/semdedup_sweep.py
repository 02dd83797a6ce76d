"""Measure the flat-vs-two-level SemDeDup crossover to pin
``SEMDEDUP_FLAT_MAX_ROWS`` (the ``semdedup_flat`` auto-switch bound).

The flat quantizer's total work is O(N^1.5) (k ~ sqrt(N) cells, N*k
assignment FLOPs); the two-level residual quantizer reaches the same
effective cell count for O(N^1.25) assignment FLOPs but pays two
trainings, a residual pass, and a probe union of fixed overhead — so
flat wins small corpora and two-level wins large ones.  This sweep
replicates the sf embeddings table R-fold (ids shifted per replica,
the scale_check growth recipe) and times BOTH lanes at each size on
the same session, printing one row per (N, flat_sec, two_level_sec).

Usage: python tools/semdedup_sweep.py [sf_dir] [replicas ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dax_ppdb_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    reps = [int(a) for a in (args[1:] if args and os.path.isdir(args[0]) else args)]
    if not reps:
        reps = [1, 10, 30, 100]

    from dax_ppdb_spark.llm.embeddings import (
        auto_semdedup_clusters,
        auto_semdedup_levels,
        semdedup_pairs,
        semdedup_pairs_two_level,
    )

    spark = get_spark("semdedup_sweep")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = base.count()
    work = tempfile.mkdtemp(prefix="semdedup_sweep_")
    print(f"base={n0} rows  sf_dir={sf_dir}  replicas={reps}")
    for r in reps:
        n = n0 * r
        path = os.path.join(work, f"emb_{r}x.parquet")
        if not os.path.isdir(path):
            rep = spark.range(r).select(F.col("id").alias("__rep"))
            grown = base.crossJoin(rep).select(
                (F.col("vec_id") + F.col("__rep") * F.lit(n0)).alias("vec_id"),
                # Perturb one coordinate per replica so replicas are
                # not bit-identical vectors (which would inflate
                # in-cell pair yield unrealistically): the shift is
                # tiny (1e-4 * rep) and keeps the cluster structure.
                F.expr(
                    "transform(embedding, (x, i) -> x + CASE WHEN i = 0 "
                    "THEN __rep * 1.0e-4 ELSE 0.0 END)"
                ).alias("embedding"),
                "label",
            )
            grown.write.mode("overwrite").parquet(path)
        emb = spark.read.parquet(path)
        k = auto_semdedup_clusters(n)
        k1, k2 = auto_semdedup_levels(n)

        t0 = time.time()
        flat = semdedup_pairs(
            emb, threshold=0.3, n_clusters=k, sample_mod=2
        ).count()
        t_flat = time.time() - t0

        t0 = time.time()
        two = semdedup_pairs_two_level(
            emb, k1, k2, threshold=0.3, sample_mod=2
        ).count()
        t_two = time.time() - t0

        print(
            f"N={n:>9}  k={k:>4}  k1xk2={k1}x{k2}  "
            f"flat={t_flat:7.1f}s ({flat} pairs)  "
            f"two_level={t_two:7.1f}s ({two} pairs)"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
