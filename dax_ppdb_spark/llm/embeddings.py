"""Embedding-column preprocessing: int8 quantization and
cluster-scoped semantic dedup (SemDeDup).

Both operators treat the embedding column (``array<float>``) the way a
100 TB training-data pipeline has to: per-row work stays in JVM-side
array expressions (zero shuffle for quantization), and anything
pairwise is confined to a partition key (the k-means cell) so the
candidate fan-out is bounded by cluster occupancy, never the corpus.

Cross-engine determinism follows the module convention: double
arithmetic in deterministic order, outputs rounded to 6 decimals so
last-ulp engine differences cannot flip the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import assign_cells, cosine_similarity, kmeans_centroids


def _half_up(x: Column) -> Column:
    """round-half-toward-+inf as ``floor(x + 0.5)`` — exact and
    engine-identical (both Spark's and DuckDB's ``round`` are
    half-away-from-zero, but ``floor`` is the one primitive with no
    rounding-mode ambiguity at all)."""
    return F.floor(x + F.lit(0.5))


def quantize_int8(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization with reconstruction
    error — the standard 4x memory/IO compression step before ANN
    serving or shipping embeddings to a training job.

    Per vector: ``scale = max(|x|)/127``; ``q_i = clamp(round(x_i /
    scale), -127, 127)``; the all-zero vector quantizes to zeros with
    ``scale = 0``.  Emits per-row summary scalars rather than the
    quantized array itself (the array is trivially reconstructed;
    scalars keep the driver-compare engine-portable):

    - ``dim`` — vector length,
    - ``scale`` — the dequantization step, UNROUNDED: it is produced
      by exact IEEE ops only (max of abs, one division — no
      summation whose order could differ between engines), so it is
      bit-identical everywhere, and rounding it would destroy the
      ability to dequantize small-magnitude vectors (a 1e-7-norm
      vector's scale rounds to 0.0 at 6 decimals while its codes are
      non-zero — caught by the property suite),
    - ``qnorm_sq`` — sum of squared int8 codes (exact int64, an
      order-insensitive content anchor for the whole code vector),
    - ``rmse`` — root-mean-square reconstruction error (round 6).

    Scale posture: pure map-side column expressions inside whole-stage
    codegen — zero shuffle, linear in bytes scanned, embarrassingly
    parallel at any corpus size.
    """
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.when(scale == 0, F.lit(0).cast("long")).otherwise(
            F.greatest(
                F.lit(-127).cast("long"),
                F.least(F.lit(127).cast("long"), _half_up(x / scale).cast("long")),
            )
        ),
    )
    qnorm_sq = F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    err2 = F.aggregate(
        F.zip_with(v, q, lambda x, qi: (x - qi * scale) * (x - qi * scale)),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    dim = F.size(v)
    return emb.select(
        F.col(id_col),
        dim.alias("dim"),
        scale.alias("scale"),
        qnorm_sq.alias("qnorm_sq"),
        F.round(F.sqrt(err2 / F.greatest(dim, F.lit(1))), 6).alias("rmse"),
    )


def auto_semdedup_clusters(n: int) -> int:
    """Cluster count for :func:`semdedup_pairs` from the corpus size:
    ``max(8, ceil(sqrt(n)))`` — the cost optimum for a FLAT quantizer,
    where assignment work is ``N*k`` and expected in-cell pair work is
    ``N^2/(2k)``; ``k ~ sqrt(N)`` balances them at ``O(N^1.5)`` total.
    Same design as ``dedup.auto_bands``: the parameter tracks the
    corpus so growth has no silent quadratic term, and the rule is
    trivially replayable by the SQL oracle.  (The O(N) tier at 100 TB
    is a hierarchical two-level quantizer or the banded sign-LSH path
    in ``dedup.embedding_neardup_pairs``; flat Lloyd with inlined
    centroid literals is honest up to a few hundred cells.)
    """
    import math

    return max(8, math.isqrt(max(n, 1) - 1) + 1)


def semdedup_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    n_clusters: int | None = None,
    iters: int = 3,
    sample_mod: int | None = None,
    max_cell: int | None = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs
    found WITHIN k-means cells only — cluster the corpus with the
    deterministic sampled Lloyd quantizer, then score cosine pairs
    inside each cell.

    This is the other scale path to embedding dedup, complementary to
    the sign-LSH bands in :func:`..dedup.embedding_neardup_pairs`:
    instead of hash buckets, the partition key is a LEARNED cell, so
    near-dup recall concentrates where the data actually clusters.
    ``n_clusters`` defaults to :func:`auto_semdedup_clusters` of the
    corpus count (k ~ sqrt(N), the flat-quantizer cost optimum) so the
    in-cell pair expansion can never go quadratic behind a fixed
    default; ``max_cell`` is the usual default-on skew guard (a
    degenerate cell — all-zero embeddings — is capped out rather than
    detonating one task).  The cell self-join shuffles ids+vectors
    once on ``cid`` — never an all-pairs cross join (pinned by tests).

    Output: (cid, vec_a, vec_b, cosine round 6) with ``vec_a <
    vec_b`` and cosine >= ``threshold``.
    """
    if n_clusters is None:
        n_clusters = auto_semdedup_clusters(emb.count())
    cents = kmeans_centroids(emb, n_clusters, iters, vec_col, id_col, sample_mod)
    assigned = assign_cells(
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ),
        cents,
    )
    if max_cell is not None:
        ok = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= max_cell)
            .select("cid")
        )
        assigned = assigned.join(F.broadcast(ok), "cid")
    a = assigned.select("cid", F.col("id").alias("vec_a"), F.col("v").alias("va"))
    b = assigned.select("cid", F.col("id").alias("vec_b"), F.col("v").alias("vb"))
    cos = F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, "cid")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("cid", "vec_a", "vec_b", "cosine")
    )
