"""Trainable quality/domain classifier — fasttext-style hashed
bag-of-tokens logistic regression, trained INSIDE the engine.

Every serious pretraining pipeline runs learned filters (CCNet's
wiki-reference quality classifier, LLaMA's fasttext language/quality
gates): a linear model over hashed token features, trained on a
labeled slice, then scored over the whole corpus.  The operator shape
is what matters at 100 TB — per round ONE map-side pass computes each
document's residual under the current weights (shipped as a literal —
``dim+1`` doubles, model-sized by construction) and ONE aggregation
reduces per-feature gradients; scoring is a pure map.  No driver-side
data, no per-row Python.

Determinism/parity (the cross-engine oracle contract):

- features are ``md5_long(token) % dim`` — the engine-portable hash;
- the dot product folds LEFT-TO-RIGHT over the document's tokens
  (``F.aggregate`` / DuckDB ``list_reduce``), so double addition
  order is identical in both engines;
- the residual is rounded HALF_UP to 6 decimals and cast to DECIMAL
  before the gradient sum, making the per-feature gradient an EXACT,
  order-insensitive decimal total (the same discipline as
  ``embeddings.covariance`` — a raw double sum would drift with
  partial-aggregation order and the drift COMPOUNDS round over
  round);
- the weight update ``w + (lr * g) / n`` runs in the same IEEE
  association on both sides from the same exact gradients.

Reference parity note: the reference has no learned filters (it is an
astronomy catalog pipeline); this is part of the beyond-reference
LLM-data operator library.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import md5_long, tokens


def _hashed_tokens(text: Column, dim: int) -> Column:
    """Per-doc array of hashed token feature ids in [0, dim)."""
    return F.transform(
        tokens(text), lambda tk: (md5_long(tk) % dim).cast("int")
    )


def _dot(hj: Column, weights: list[float], dim: int) -> Column:
    """LEFT-TO-RIGHT fold of the hashed-feature dot product plus the
    bias term (``weights[dim]``): addition order is pinned so the
    double result is bit-identical to the oracle's ``list_reduce``."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    return (
        F.aggregate(
            hj,
            F.lit(0.0),
            lambda acc, j: acc + F.element_at(w, j + 1),
        )
        + F.lit(float(weights[dim]))
    )


def hashed_logistic_train(
    docs: DataFrame,
    label_col: str = "label",
    dim: int = 64,
    rounds: int = 3,
    lr: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[float]:
    """Train the hashed logistic model; returns ``dim + 1`` weights
    (last = bias), all zeros at init.

    Per round: residual ``r = round(y - sigmoid(w·x), 6)`` map-side
    under the CURRENT weights, one decimal-exact aggregation of
    ``sum(r)`` per feature (each token instance contributes its doc's
    residual to its feature; every doc contributes once to the bias
    feature ``dim``), then the driver applies
    ``w_j += (lr * g_j) / n`` — the model is ``dim+1`` numbers, the
    only thing that ever leaves the executors.
    """
    tk = _tokenized(docs, label_col, dim, text_col, id_col)
    return _train_on_tokens(tk, dim, rounds, lr)


def _tokenized(
    docs: DataFrame, label_col: str, dim: int, text_col: str, id_col: str
) -> DataFrame:
    """The checkpointed ``(doc_id, y, hj)`` training relation — built
    once; the gradient rounds AND the one-shot scoring pass both read
    its materialized blocks, so the corpus is tokenized exactly once
    per train-and-score call.

    ``hj`` coalesces to the EMPTY array for NULL text: tokens(NULL) is
    NULL, concat(NULL, [bias]) is NULL, and explode would then drop
    the doc from the gradient aggregation entirely — silently
    excluding it from the fused bias-group count that stands in for
    the training-set size n (the pre-fusion tk.count() included every
    doc).  With the coalesce, a NULL-text doc contributes exactly its
    bias row, preserving the old n semantics and the 'bias appears
    once per doc' invariant the fused count relies on."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).cast("double").alias("y"),
        F.coalesce(
            _hashed_tokens(F.col(text_col), dim),
            F.array().cast("array<int>"),
        ).alias("hj"),
    ).localCheckpoint(eager=False)


def _train_on_tokens(
    tk: DataFrame, dim: int, rounds: int, lr: float
) -> list[float]:
    n: int | None = None
    if rounds <= 0:
        n = tk.count()
        if n == 0:
            raise ValueError("hashed_logistic_train: empty training set")
    w = [0.0] * (dim + 1)
    for _ in range(rounds):
        wx = _dot(F.col("hj"), w, dim)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-wx))
        rd = F.round(F.col("y") - p, 6).cast("decimal(16,6)")
        grads = (
            tk.select(
                rd.alias("rd"),
                F.explode(
                    F.concat(F.col("hj"), F.array(F.lit(dim)))
                ).alias("j"),
            )
            .groupBy("j")
            # count rides the same aggregation: the bias feature (j =
            # dim) appears exactly once per doc, so its group count IS
            # the training-set size — the separate n = tk.count() job
            # (which also paid the checkpoint materialization up
            # front) is gone.
            .agg(F.sum("rd").alias("g"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        if n is None:
            n = next((int(r["c"]) for r in grads if int(r["j"]) == dim), 0)
            if n == 0:
                raise ValueError("hashed_logistic_train: empty training set")
        g = {int(r["j"]): r["g"] for r in grads}
        w = [
            w[j] + (lr * float(g.get(j, 0))) / n
            for j in range(dim + 1)
        ]
    return w


def hashed_logistic_score(
    docs: DataFrame,
    weights: list[float],
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under a trained model — one map-side pass
    (the usual 100 TB inference shape: weights are literals, the scan
    is the cost).  Output: ``(id_col, score round 6, predicted)``.

    NULL text coalesces to zero tokens (score = sigmoid(bias)), the
    same convention as the training relation — so separate
    train-then-score equals the fused :func:`train_and_score` on every
    doc, NULL-text ones included."""
    hj = F.coalesce(
        _hashed_tokens(F.col(text_col), dim), F.array().cast("array<int>")
    )
    wx = _dot(hj, weights, dim)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-wx)), 6) + F.lit(0.0)
    return docs.select(
        F.col(id_col),
        score.alias("score"),
        (score >= 0.5).alias("predicted"),
    )


def train_and_score(
    docs: DataFrame,
    label_col: str = "label",
    dim: int = 64,
    rounds: int = 3,
    lr: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fit on the labeled relation, score the SAME relation — the
    one-shot evaluation form (production splits train/apply across
    relations; both halves are the functions above).

    Scoring reads the training pass's checkpointed ``(doc_id, hj)``
    relation instead of re-tokenizing the corpus: the hashed features
    are deterministic, so the scores are bit-identical and the second
    full tokenize pass (previously the whole execute-side cost) is
    gone."""
    tk = _tokenized(docs, label_col, dim, text_col, id_col)
    w = _train_on_tokens(tk, dim, rounds, lr)
    wx = _dot(F.col("hj"), w, dim)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-wx)), 6) + F.lit(0.0)
    return tk.select(
        F.col("doc_id").alias(id_col),
        score.alias("score"),
        (score >= 0.5).alias("predicted"),
    )
