"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how ANN is actually deployed on Spark:

- **brute-force top-k** — the exact baseline: broadcast the query set,
  cross-join against the corpus, JVM-side dot products, per-query
  window top-k.  Linear scan per query; right answer, and at 100 TB
  the fallback verify stage.
- **IVF-style bucketed top-k** — the scale path: partition the corpus
  by a deterministic coarse quantizer (sign-pattern buckets here;
  k-means centroids in a real deployment), probe only the query's
  bucket.  Turns the scan into a partition-pruned lookup.

The dot product is a sequential ``aggregate`` fold over ``zip_with``
products in double precision — deterministic and identical to a C++
sequential loop, which is what keeps the DuckDB oracle hash-equal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def _pair_cosine(qv: str, cv: str, n2q: str = "n2q", n2c: str = "n2c") -> Column:
    """Round-6 cosine over a joined pair whose squared norms were
    computed per VECTOR before the join (columns ``n2q``/``n2c``).
    Same expression tree :func:`cosine_similarity` expands to —
    bit-identical doubles — at a third of the interpreted-fold work
    (HOFs never enter whole-stage codegen; the self-dots dominated
    every pair-scoring stage that used the in-place form)."""
    return F.round(
        dot(F.col(qv), F.col(cv)) / F.sqrt(F.col(n2q) * F.col(n2c)), 6
    )


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    precompute_n2: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries`` carries (id_col, vec_col); it is broadcast (query sets
    are small by construction), so the corpus side never shuffles —
    the window's partition key is the query id, whose cardinality is
    tiny, and AQE coalesces.

    ``precompute_n2`` moves the squared norms out of the per-pair
    cosine (see :func:`_pair_cosine` — a third of the interpreted-fold
    work, bit-identical result).  Callers whose ``vec_col`` is a
    DERIVED expression (:func:`topk_pq`'s reconstruction) pass False:
    CollapseProject inlines the defining expression into both ``dot``
    references, so the norm column would re-reconstruct every corpus
    row twice — costlier than the per-pair folds it saves whenever the
    query set is small (measured +0.8 s on ann_topk_pq at sf0.1).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    if precompute_n2:
        c = c.withColumn("n2c", dot(F.col("cv"), F.col("cv")))
        q = q.withColumn("n2q", dot(F.col("qv"), F.col("qv")))
        sim = _pair_cosine("qv", "cv")
    else:
        sim = F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    joined = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k_cb: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the ``d`` dimensions into
    ``m`` contiguous subspaces of ``d/m`` dims and train one
    deterministic k-means codebook per subspace
    (:func:`kmeans_centroids` — same init/tie-break/round-6 rules, so
    the DuckDB oracle replays each subspace training as its own Lloyd
    CTE chain).  Returns ``books[s][cid]`` = centroid vector.

    PQ is the memory tier past SQ8: codes cost ``m * log2(k_cb)``
    bits per vector (vs 8 bits/dim for SQ8), which is what makes a
    10^11-vector index fit a cluster's RAM.  Training scans the
    hash sample once per subspace — at 100 TB each pass reads the
    same sampled GBs (the :func:`kmeans_centroids` contract).
    """
    from .text import md5_long

    first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("pq_codebooks: empty corpus")
    d = first["d"]
    if d % m:
        raise ValueError(f"pq_codebooks: dim {d} not divisible by m={m}")
    sub = d // m
    # Every subspace trains on the SAME hash-sampled id set (the md5
    # filter does not depend on the subspace), so when the sample fits
    # the driver one collect of the FULL vectors funds all m Lloyd
    # chains: slice the matrix per subspace and run the bit-replayed
    # local loop (``_lloyd_local`` on a column slice sees exactly the
    # rows the old per-subspace collect saw, in the same id order).
    # The previous shape paid m sequential (count + collect) job pairs
    # — 2m driver-scheduled jobs re-reading the same sample.
    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if sample_mod is not None:
        c = c.filter(md5_long(F.col("id").cast("string")) % sample_mod == 0)
    X = _collect_id_sorted_sample(c)
    if X is not None:
        import numpy as np

        if len(X) == 0:
            raise ValueError("pq_codebooks: empty training sample")
        return [
            _lloyd_local(
                np.ascontiguousarray(X[:, s * sub : (s + 1) * sub]), k_cb, iters
            )
            for s in range(m)
        ]
    books = []
    for s in range(m):
        sliced = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"), s * sub + 1, sub).alias(
                "v"
            ),
        )
        book = kmeans_centroids(
            sliced, k_cb, iters, vec_col="v", id_col=id_col, sample_mod=sample_mod
        )
        if not book:
            raise ValueError("pq_codebooks: empty training sample")
        books.append(book)
    return books


def pq_reconstruct(
    emb: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "rv",
) -> DataFrame:
    """Encode-and-reconstruct under PQ codebooks in ONE map-side pass:
    each subspace slice is assigned to its nearest codebook centroid
    (the code) and the reconstruction concatenates the chosen
    centroids — the vector an ADC/IVFPQ scorer actually compares
    against.  The codebooks ride in a one-row broadcast (data, not
    expression nodes — the :func:`assign_cells` contract, O(1) plan
    size in ``m * k_cb``); arithmetic is the same sequential fold +
    first-wins struct-min, so the oracle replays it value-for-value.
    """
    m = len(books)
    sub = len(books[0][0])
    bdf = emb.sparkSession.createDataFrame(
        [([[list(map(float, c)) for c in b] for b in books],)],
        "__books: array<array<array<double>>>",
    )
    v = F.col(vec_col).cast("array<double>")
    rv = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.element_at(
                F.element_at(F.col("__books"), s + 1),
                _argmin_dist(
                    F.slice(v, s * sub + 1, sub),
                    F.element_at(F.col("__books"), s + 1),
                )
                + 1,
            ),
        )
    )
    return (
        emb.crossJoin(F.broadcast(bdf))
        .withColumn(out_col, rv)
        .drop("__books")
    )


def topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    k_cb: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> DataFrame:
    """Product-quantized top-k: full-precision queries scored against
    the PQ-reconstructed corpus (asymmetric scoring, FAISS ``PQx``):
    train per-subspace codebooks, encode+reconstruct the corpus
    map-side, then the broadcast-query scan of
    :func:`topk_bruteforce`.  The scan is still O(N) rows — PQ buys
    MEMORY (m*log2(k_cb) bits/vector), not scan count; compose with
    the IVF cell probe for both.
    """
    books = pq_codebooks(corpus, m, k_cb, iters, vec_col, id_col, sample_mod)
    rec = pq_reconstruct(corpus, books, vec_col, id_col).select(
        F.col(id_col), F.col("rv").alias(vec_col)
    )
    # scoring tail IS the brute-force scan over the reconstruction —
    # one convention (round-6 cosine, (desc, id) tie-break), one place.
    # precompute_n2=False: rv is a derived expression; a norm column
    # would inline the whole PQ reconstruction twice more per row.
    return topk_bruteforce(rec, queries, k, vec_col, id_col, precompute_n2=False)


def topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    m: int = 4,
    k_cb: int = 8,
    iters: int = 3,
    pq_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> DataFrame:
    """IVFPQ — the production FAISS shape: a learned coarse quantizer
    prunes the scan to the query's cell, and product quantization of
    the RESIDUALS (vector minus its coarse centroid) compresses what
    the cell stores.  Residual PQ beats raw-vector PQ because residual
    magnitudes are a cell-diameter, not a corpus-diameter — the same
    codebook budget buys finer resolution.

    Everything deterministic end to end (sampled Lloyd for both
    quantizer levels, first-wins argmin, round-6 centroid means), so
    the DuckDB oracle replays the coarse chain, the residual
    construction, all m subspace chains, and the add-back
    reconstruction value-for-value.

    Scale shape: coarse training scans a hash sample; assignment,
    residuals, PQ encode and reconstruction are ONE map-side pass with
    both codebook levels shipped as broadcast data; scoring joins the
    broadcast queries to their cell only (the IVF prune), never the
    full corpus.
    """
    from .text import md5_long

    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # BOTH quantizer levels train on the same hash-sampled id set (the
    # md5 filter is subspace- and level-independent), so when the
    # sample fits the driver, ONE collect funds the whole training
    # cascade: coarse Lloyd, coarse assignment, exact-IEEE residual
    # subtraction, and all m residual-subspace Lloyd chains — the
    # two_level_centroids pattern extended to PQ.  The previous shape
    # was ~12 sequential driver jobs (coarse count+collect, dim probe,
    # m x (count + collect) over the checkpointed residual relation).
    # Distributed fallback (big samples) keeps the old job cascade.
    tr = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if sample_mod is not None:
        tr = tr.filter(md5_long(F.col("id").cast("string")) % sample_mod == 0)
    X = _collect_id_sorted_sample(tr)
    books = None
    if X is not None:
        import numpy as np

        if len(X) == 0:
            raise ValueError("topk_ivfpq: empty corpus")
        d = X.shape[1]
        if d % m:
            raise ValueError(f"pq_codebooks: dim {d} not divisible by m={m}")
        sub = d // m
        cents = _lloyd_local(X, n_clusters, iters)
        C = np.array(cents, dtype=np.float64)
        R = X - C[_assign_local(X, C)]
        books = [
            _lloyd_local(
                np.ascontiguousarray(R[:, s * sub : (s + 1) * sub]), k_cb, pq_iters
            )
            for s in range(m)
        ]
    else:
        cents = kmeans_centroids(
            corpus, n_clusters, iters, vec_col, id_col, sample_mod
        )
        if not cents:
            raise ValueError("topk_ivfpq: empty corpus")
    cdf = corpus.sparkSession.createDataFrame(
        [([[float(x) for x in cc] for cc in cents],)],
        "__cents: array<array<double>>",
    )
    t = (
        c.crossJoin(F.broadcast(cdf))
        .withColumn("cid", _argmin_dist(F.col("v"), F.col("__cents")))
        .withColumn("cc", F.element_at(F.col("__cents"), F.col("cid") + 1))
        .drop("__cents")
        .withColumn("r", F.zip_with("v", "cc", lambda a, b: a - b))
    )
    if books is None:
        # Distributed training consumes t m+2 times (m subspace
        # trainings, the dim probe, the scoring plan) — localCheckpoint
        # so the argmin assignment pass runs once per consumer set.
        # On the fused local path t has exactly ONE consumer (the
        # reconstruction below), so a checkpoint would be a pure extra
        # materialization pass.
        t = t.localCheckpoint(eager=False)
        books = pq_codebooks(
            t.select(F.col("nid"), F.col("r")),
            m,
            k_cb,
            pq_iters,
            vec_col="r",
            id_col="nid",
            sample_mod=sample_mod,
        )
    rec = pq_reconstruct(t, books, vec_col="r", id_col="nid", out_col="rres")
    # cv is DERIVED (coarse + residual reconstruction): no norm
    # precompute — CollapseProject would inline the reconstruction
    # into both self-dot references, re-running it twice per row for
    # a per-pair saving the small query side cannot repay.
    corpus_side = rec.select(
        F.col("nid").alias("neighbor_id"),
        "cid",
        F.zip_with("cc", "rres", lambda a, b: a + b).alias("cv"),
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .crossJoin(F.broadcast(cdf))
        .withColumn("cid", _argmin_dist(F.col("qv"), F.col("__cents")))
        .drop("__cents")
    )
    joined = corpus_side.join(
        F.broadcast(q),
        (F.col("neighbor_id") != F.col("query_id"))
        & (corpus_side["cid"] == q["cid"]),
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def sign_bucket(vec: Column, dims: tuple[int, ...] = (1, 17, 33, 49)) -> Column:
    """Deterministic coarse quantizer: sign pattern on fixed axes."""
    return F.concat_ws(
        "", *[(F.element_at(vec, d) >= 0).cast("int").cast("string") for d in dims]
    )


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based index of the closest centroid (first wins on ties) with
    the centroid table inlined as an expression-tree literal.

    Use :func:`assign_cells` on any corpus-derived k: PySpark
    desugars a nested-list literal into a ``CreateArray`` tree of
    k*dim nodes, and EVERY job that includes it pays O(nodes x
    analyzer/optimizer rules) of plan processing — measured 1.4 s per
    job at k=45, dim=64 on a SINGLE ROW, i.e. pure plan-time cost
    that scales with k and dwarfs the actual execution.  This
    expression variant remains for tiny fixed k (unit tests, probe
    expressions) where a join is heavier than the tree.

    The argmin is a ONE-PASS struct-min: zip each distance with its
    index and take ``array_min`` of the (d, i) structs — struct
    ordering compares d first, then i, so equal distances resolve to
    the FIRST index, exactly ``array_position(d, array_min(d))``'s
    tie-break — but the distance array is evaluated once instead of
    twice (higher-order folds see no common-subexpression
    elimination; the two-reference shape measured 1.5x slower).
    """
    cents = F.lit([[float(x) for x in c] for c in centroids])
    return _argmin_dist(vec, cents)


def _argmin_dist(vec: Column, cents: Column) -> Column:
    """Struct-min argmin of squared distance: sequential zip_with fold
    per centroid (deterministic summation order — the DuckDB oracles
    replay it term for term), first index wins ties.

    The index sequence bound comes from ``size(cents)``, NOT an
    inlined ``lit(k-1)``: integer literals are pasted into the
    generated code, so a k-dependent literal gives every distinct
    cluster count its own codegen unit and a multi-second compile —
    with the data-derived bound the generated source is byte-identical
    for ANY k and the bench warm-up at a different scale factor (hence
    different auto-k) warms this plan too."""
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    tagged = F.zip_with(
        dists,
        F.sequence(F.lit(0), F.size(cents) - 1),
        lambda d, i: F.struct(d.alias("d"), i.alias("i")),
    )
    return F.array_min(tagged)["i"].cast("int")


def _argmin_multi(vec: Column, cents: Column, probes: int) -> Column:
    """Indices of the ``probes`` nearest centroids, nearest first —
    the multi-probe generalization of :func:`_argmin_dist` (identical
    distance fold; ``array_sort`` on (d, i) structs gives the same
    first-index tie-break as the struct-min, and the SQL oracle
    replays it as ``ROW_NUMBER() ... WHERE rn <= probes``)."""
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    tagged = F.zip_with(
        dists,
        F.sequence(F.lit(0), F.size(cents) - 1),
        lambda d, i: F.struct(d.alias("d"), i.alias("i")),
    )
    return F.transform(
        F.slice(F.array_sort(tagged), 1, probes), lambda s: s["i"].cast("int")
    )


def assign_cells_multi(
    df: DataFrame,
    centroids: list[list[float]],
    probes: int,
    vec_col: str = "v",
    out_col: str = "cid",
) -> DataFrame:
    """Multi-probe :func:`assign_cells`: one output row per (input
    row, probe), ``out_col`` exploding over the ``probes`` nearest
    cells — the recall lever for product-quantized pair mining (a
    pair near a fine-cell boundary meets in the neighbor's cell).
    Same broadcast-data centroid shipping as the single-probe path.
    """
    cents = [[float(x) for x in c] for c in centroids]
    cdf = df.sparkSession.createDataFrame(
        [(cents,)], "__cents: array<array<double>>"
    )
    return (
        df.crossJoin(F.broadcast(cdf))
        .withColumn(
            out_col,
            F.explode(_argmin_multi(F.col(vec_col), F.col("__cents"), probes)),
        )
        .drop("__cents")
    )


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "v",
    out_col: str = "cid",
) -> DataFrame:
    """Attach ``out_col`` = nearest-centroid index to every row, with
    the centroid table shipped as DATA, not expression nodes.

    The centroids ride in a broadcast ONE-ROW DataFrame cross-joined
    onto the input, so the assignment expression is O(1) plan nodes
    regardless of k: plan analysis stays constant-time where the
    literal-tree variant cost O(k*dim) per job (1.4 s at k=45 — it
    made the Lloyd loop ~2 s/iteration on a 1000-row sample), and the
    broadcast is k*dim doubles — bytes, reused by every task.
    Measured: 0.6 s/iteration at k=45 AND k=90, flat in k.
    Arithmetic is the same sequential fold + first-wins struct-min as
    :func:`nearest_centroid`, so assignments are bit-identical and
    every existing oracle replay still holds.
    """
    cents = [[float(x) for x in c] for c in centroids]
    cdf = df.sparkSession.createDataFrame(
        [(cents,)], "__cents: array<array<double>>"
    )
    # The crossJoin materializes as a BroadcastNestedLoopJoin whose
    # build side is this ONE ROW of constant bytes — the benign kind
    # (an equi-key dodge does not survive Catalyst anyway: any
    # single-valued key gets constant-propagated into a build-side
    # filter and the join degenerates back to condition-free).  The
    # plan tests distinguish it from a real all-pairs loop by its
    # __cents build column.
    return (
        df.crossJoin(F.broadcast(cdf))
        .withColumn(out_col, _argmin_dist(F.col(vec_col), F.col("__cents")))
        .drop("__cents")
    )


def _round6_half_up(x: float) -> float:
    """Exact decimal HALF_UP to 6 places — Spark's ``F.round``
    (java BigDecimal HALF_UP) and DuckDB's ``round`` bit for bit.
    ``decimal.Decimal(float)`` converts the binary double exactly, so
    there is no double-rounding hazard (``floor(x*1e6 + 0.5)`` has
    one: the ``*1e6`` itself rounds)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _assign_local(X: "np.ndarray", cents: "np.ndarray") -> "np.ndarray":
    """Driver-local twin of :func:`_argmin_dist`: squared distances
    accumulated SEQUENTIALLY over dimensions (``acc += (x_d - c_d)^2``
    for d = 0..dim-1 — the same IEEE addition order as the zip_with
    fold, so distances are bit-identical), first index wins ties
    (``np.argmin`` returns the first occurrence, matching the
    struct-min)."""
    import numpy as np

    acc = np.zeros((X.shape[0], cents.shape[0]))
    for d in range(X.shape[1]):
        diff = X[:, d][:, None] - cents[:, d][None, :]
        acc += diff * diff
    return np.argmin(acc, axis=1)


def _lloyd_local(X: "np.ndarray", n_clusters: int, iters: int) -> list[list[float]]:
    """Driver-local Lloyd on an id-sorted sample matrix: init = first
    ``n_clusters`` rows, per-iteration first-wins argmin assignment and
    round-6 (exact decimal HALF_UP) element-wise means, empty cells
    keeping their previous centroid — the same update rule as the
    DataFrame loop, so the DuckDB oracle replay holds unchanged.  (The
    mean's summation order differs between numpy, Spark partial
    aggregation, and DuckDB; the round-6 absorbs that last-ulp noise —
    the same tolerance the cross-engine gate has always relied on.)"""
    import numpy as np

    cents = X[: min(n_clusters, len(X))].astype(np.float64).copy()
    for _ in range(iters):
        cid = _assign_local(X, cents)
        new = []
        for j in range(len(cents)):
            members = X[cid == j]
            if len(members) == 0:
                new.append(cents[j])
            else:
                new.append(
                    np.array([_round6_half_up(v) for v in members.mean(axis=0)])
                )
        cents = np.stack(new)
    return [[float(x) for x in c] for c in cents]


# Below this many training rows the Lloyd loop runs driver-local on
# the collected sample: each distributed iteration is 2+ Spark jobs
# re-executing the sample's lineage, pure scheduling overhead once the
# sample fits in driver memory.  Same metadata-driven decision as
# ops/graph.py's single-task union-find: the threshold is checked
# against a MEASURED count, big samples keep the distributed loop.
LOCAL_TRAIN_ROWS = 100_000


def _collect_id_sorted_sample(c: DataFrame):
    """ONE-job gate-probe + collect for the driver-local training path.

    ``limit(LOCAL_TRAIN_ROWS + 1)`` either returns the ENTIRE sample
    (a limit past the end is a no-op, so <= LOCAL_TRAIN_ROWS rows means
    we already hold all of them) or proves the sample is big by
    returning one row more than the bound.  That replaces the previous
    persist + count + collect pair (two sequential Spark jobs, each
    paying scheduler latency) with a single job — and on the BIG-sample
    path the CollectLimit early-terminates after the first partitions,
    so the probe is far cheaper than the count it replaces.

    ``c`` must have columns ``(id, v)``.  Returns the id-sorted sample
    matrix (possibly 0 rows), or ``None`` when the sample exceeds
    :data:`LOCAL_TRAIN_ROWS` and the caller must run distributed.
    """
    import numpy as np

    rows = c.limit(LOCAL_TRAIN_ROWS + 1).collect()
    if len(rows) > LOCAL_TRAIN_ROWS:
        return None
    rows.sort(key=lambda r: r[0])
    return np.array([r[1] for r in rows], dtype=np.float64)


def kmeans_centroids(
    corpus: DataFrame,
    n_clusters: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd iterations on DataFrames — the real IVF
    coarse quantizer (``sign_bucket`` is the model-free stand-in).

    ``sample_mod`` trains the quantizer on a deterministic hash sample
    of the corpus: rows with ``md5_long(id) % sample_mod == 0`` (a
    1/sample_mod systematic sample, engine-replayable — unlike
    ``DataFrame.sample``, whose per-partition RNG depends on the
    physical split layout).  Centroid quality needs only a
    statistically representative sample, so at 100 TB each Lloyd
    iteration scans GBs instead of the full corpus; assignment of the
    full corpus happens once, outside this function.

    Deterministic by construction: init = the ``n_clusters`` lowest-id
    training vectors, fixed iteration count, first-wins tie-break on
    assignment, and centroids rounded to 6 decimals each update so
    float partial-aggregation ulp noise cannot flip assignments
    between runs.  Each iteration is one assignment pass (centroids
    inlined as literals — no join, no shuffle) plus one element-wise
    mean (posexplode + groupBy over n_clusters*dim cells).  Only
    ``n_clusters * dim`` floats ever reach the driver.
    """
    from .text import md5_long

    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if sample_mod is not None:
        c = c.filter(md5_long(F.col("id").cast("string")) % sample_mod == 0)
    # Driver-local fast path: ONE limit-probe job both measures the
    # gate and collects the whole sample when it fits
    # (:func:`_collect_id_sorted_sample`) — vs the previous
    # persist+count+collect pair.  Every Lloyd iteration then runs on
    # the driver matrix.
    X = _collect_id_sorted_sample(c)
    if X is not None:
        if len(X) == 0:
            return []
        return _lloyd_local(X, n_clusters, iters)
    # Persist the projected training sample for the duration of the
    # loop: every Lloyd iteration is a fresh Spark job, and without
    # this each of the iters+1 jobs RE-EXECUTES the sample's entire
    # lineage — at 100 TB that is iters full corpus scans (and for the
    # two-level quantizer's fine pass, iters re-runs of the coarse
    # assignment).  The persisted set is bounded by construction
    # (sample_mod scales with the corpus), and training is eager, so
    # the unpersist below never invalidates caller-visible lineage.
    c = c.persist()
    try:
        cents = [r.v for r in c.orderBy("id").limit(n_clusters).collect()]
        for _ in range(iters):
            assigned = assign_cells(c, cents).select("cid", "v")
            cells = (
                assigned.select("cid", F.posexplode("v").alias("pos", "val"))
                .groupBy("cid", "pos")
                .agg(F.round(F.avg("val"), 6).alias("m"))
                .collect()
            )
            new = {cid: dict() for cid in range(len(cents))}
            for r in cells:
                new[r.cid][r.pos] = r.m
            cents = [
                [new[cid][p] for p in sorted(new[cid])] if new[cid] else cents[cid]
                for cid in range(len(cents))
            ]
    finally:
        c.unpersist()
    return cents


def canonical_residual(r: Column) -> Column:
    """Sign-canonicalized residual: multiply by the sign of the
    largest-|magnitude| component (first index wins ties).

    A near-dup pair straddling its coarse centroid gets residuals
    ``r`` and ``~-r`` — direction-sensitive fine quantization would
    split exactly the pairs SemDeDup exists to find.  Canonicalizing
    the sign folds the +-r symmetry away: both residuals map to (up
    to their tiny true difference) the same vector.  The multiply is
    by exactly +-1/0, so values stay bit-identical and the DuckDB
    oracle replays it with ``sign``/``list_position`` (both engines
    resolve abs ties to the FIRST index)."""
    la = F.transform(r, lambda x: F.abs(x))
    s = F.signum(F.element_at(r, F.array_position(la, F.array_max(la)).cast("int")))
    return F.transform(r, lambda x: x * s)


def with_canonical_residual(df: DataFrame, src: Column, out: str) -> DataFrame:
    """:func:`canonical_residual` with the intermediates HOISTED to
    columns, for hot full-corpus paths.

    As one inline Column expression the residual is pathological:
    higher-order functions are interpreted (never codegen'd), Spark
    does no common-subexpression elimination inside lambda bodies, and
    the final ``transform(r, x -> x * s)`` re-evaluates the whole sign
    expression — array abs + max + position over ``r``, with ``r``
    itself re-expanded — PER ARRAY ELEMENT.  For a 64-dim embedding
    that is ~25k interpreted ops per row against ~320 for the hoisted
    form (measured on the semdedup assignment pass: 3.3 s -> 2.0 s at
    sf0.1).  Hoisting each intermediate to its own column evaluates it
    once per row; the lambda bodies then reference plain bound columns.
    Arithmetic (and therefore every oracle replay) is bit-identical to
    :func:`canonical_residual`."""
    la = F.transform(F.col("__cr_r0"), lambda x: F.abs(x))
    return (
        df.withColumn("__cr_r0", src)
        .withColumn("__cr_la", la)
        .withColumn(
            "__cr_s",
            F.signum(
                F.element_at(
                    F.col("__cr_r0"),
                    F.array_position(
                        F.col("__cr_la"), F.array_max(F.col("__cr_la"))
                    ).cast("int"),
                )
            ),
        )
        .withColumn(out, F.transform(F.col("__cr_r0"), lambda x: x * F.col("__cr_s")))
        .drop("__cr_r0", "__cr_la", "__cr_s")
    )


def _canonical_residual_local(R: "np.ndarray") -> "np.ndarray":
    """Driver-local twin of :func:`canonical_residual` (np.argmax
    also resolves ties to the first index)."""
    import numpy as np

    if R.shape[0] == 0 or R.shape[1] == 0:
        return R
    idx = np.argmax(np.abs(R), axis=1)
    s = np.sign(R[np.arange(R.shape[0]), idx])
    return R * s[:, None]


def _assign_multi_local(
    X: "np.ndarray", cents: "np.ndarray", probes: int
) -> "np.ndarray":
    """Vectorized twin of :func:`_argmin_multi`: the same sequential
    per-dimension distance accumulation as :func:`_assign_local`
    (bit-identical IEEE order), then the ``probes`` nearest per row —
    ``np.argsort(kind="stable")`` keeps equal distances in index order,
    exactly the (d, i) struct sort's first-index tie-break."""
    import numpy as np

    acc = np.zeros((X.shape[0], cents.shape[0]))
    for d in range(X.shape[1]):
        diff = X[:, d][:, None] - cents[:, d][None, :]
        acc += diff * diff
    return np.argsort(acc, axis=1, kind="stable")[:, : min(probes, len(cents))]


def _list_matrix(col) -> "np.ndarray":
    """(n, dim) float64 matrix from a pyarrow list<double> array —
    zero-copy over the flattened child buffer.  The vectorized
    assignment lane requires DENSE, uniform-dimension vectors (the
    embedding-table contract); anything else fails LOUDLY rather than
    silently diverging from the interpreted lane."""
    import numpy as np

    if col.null_count:
        raise ValueError("arrow assignment lane: null embedding vector")
    flat = col.flatten()
    if flat.null_count:
        raise ValueError("arrow assignment lane: null embedding element")
    vals = np.asarray(flat)
    n = len(col)
    if n == 0:
        return vals.reshape(0, 0)
    if len(vals) % n:
        raise ValueError("arrow assignment lane: ragged embedding dims")
    return vals.reshape(n, len(vals) // n)


def two_level_assign_arrow(
    e: DataFrame,
    cents1: list[list[float]],
    cents2: list[list[float]],
    probes: int,
    n_fine: int,
) -> DataFrame:
    """Vectorized (mapInArrow + NumPy) twin of the two-level
    assignment pipeline in ``semdedup_pairs_two_level``: coarse argmin,
    exact-IEEE residual, sign canonicalization, multi-probe fine
    argmin, ``cid = cid1 * n_fine + cid2`` — ONE Python-boundary
    crossing instead of four interpreted higher-order projections
    (guide §4.2; HOFs never enter codegen and cost ~25k interpreted
    ops/row at 64 dims).

    Bit-replay proof, step by step against the interpreted lane:
    distances accumulate per dimension in the zip_with fold's exact
    IEEE order (:func:`_assign_local` — the established `_lloyd_local`
    replay, which the TRAINING path already uses for this exact
    composite: ``_canonical_residual_local(X - c1[_assign_local(X,
    c1)])``); the residual subtraction is elementwise-exact; the sign
    canonicalization is :func:`_canonical_residual_local` (np.argmax
    resolves abs ties to the first index, like ``array_position`` of
    the max); the fine ranking is :func:`_assign_multi_local` (stable
    argsort == the (d, i) struct sort's first-index tie-break).  Only
    integer cell ids leave the stage — ``v`` passes through as the
    untouched input buffer — so the emitted rows are bit-identical to
    the interpreted lane's (pinned by the lane-equivalence test).

    ``e`` must be exactly ``(id, v)``; output is ``(cid, id, v)`` with
    ``probes`` rows per input row (like ``assign_cells_multi``).
    """
    import numpy as np

    C1 = np.array([[float(x) for x in c] for c in cents1], dtype=np.float64)
    C2 = np.array([[float(x) for x in c] for c in cents2], dtype=np.float64)
    id_field = e.schema["id"].dataType.simpleString()
    out_schema = f"cid int, id {id_field}, v array<double>"

    def fn(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column("id")
            vcol = batch.column("v")
            X = _list_matrix(vcol)
            cid1 = _assign_local(X, C1)
            rc = _canonical_residual_local(X - C1[cid1])
            fine = _assign_multi_local(rc, C2, probes)  # (n, p)
            p = fine.shape[1]
            cid = (cid1[:, None] * n_fine + fine).ravel().astype(np.int32)
            take = pa.array(np.repeat(np.arange(n, dtype=np.int64), p))
            yield pa.RecordBatch.from_arrays(
                [pa.array(cid), ids.take(take), vcol.take(take)],
                ["cid", "id", "v"],
            )

    return e.mapInArrow(fn, out_schema)


def flat_assign_arrow(e: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Vectorized twin of :func:`assign_cells` for the flat-quantizer
    pair lane — same bit-replay argument as
    :func:`two_level_assign_arrow`, single probe, no residual.
    ``e`` must be exactly ``(id, v)``; output is ``(cid, id, v)``."""
    import numpy as np

    C = np.array([[float(x) for x in c] for c in cents], dtype=np.float64)
    id_field = e.schema["id"].dataType.simpleString()
    out_schema = f"cid int, id {id_field}, v array<double>"

    def fn(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            X = _list_matrix(batch.column("v"))
            cid = _assign_local(X, C).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cid), batch.column("id"), batch.column("v")],
                ["cid", "id", "v"],
            )

    return e.mapInArrow(fn, out_schema)


def two_level_centroids(
    corpus: DataFrame,
    n_coarse: int,
    n_fine: int,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> tuple[list[list[float]], list[list[float]]]:
    """Train the two-level (coarse + residual) quantizer: ``n_coarse``
    Lloyd centroids on the (sampled) corpus, then ``n_fine`` centroids
    on the sample's RESIDUALS against the final coarse centroids —
    the IVF+RQ training step behind
    :func:`..embeddings.semdedup_pairs_two_level`.

    Residuals are sign-canonicalized (:func:`canonical_residual`)
    before the fine training so near-dup pairs straddling their
    coarse centroid — whose residuals are ~opposite vectors — stay
    in one fine cell.

    Under :data:`LOCAL_TRAIN_ROWS` one collect funds BOTH trainings
    (coarse Lloyd, coarse assignment, exact-IEEE residual subtraction,
    fine Lloyd — all on the driver with the bit-replayed arithmetic of
    :func:`_assign_local`); above it, both run as distributed
    DataFrame loops sharing one persisted sample.
    """
    from .text import md5_long

    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if sample_mod is not None:
        c = c.filter(md5_long(F.col("id").cast("string")) % sample_mod == 0)
    # ONE limit-probe job gates AND collects (see
    # :func:`_collect_id_sorted_sample`); both trainings run local.
    X = _collect_id_sorted_sample(c)
    if X is not None:
        import numpy as np

        if len(X) == 0:
            return [], []
        cents1 = _lloyd_local(X, n_coarse, iters)
        c1 = np.array(cents1)
        resid = _canonical_residual_local(X - c1[_assign_local(X, c1)])
        return cents1, _lloyd_local(resid, n_fine, iters)
    c = c.persist()
    try:
        cents1 = kmeans_centroids(c, n_coarse, iters, vec_col="v", id_col="id")
        c1df = c.sparkSession.createDataFrame(
            [(i, cent) for i, cent in enumerate(cents1)],
            "cid1 INT, __c1 array<double>",
        )
        res = with_canonical_residual(
            assign_cells(c, cents1, vec_col="v", out_col="cid1").join(
                F.broadcast(c1df), "cid1"
            ),
            F.zip_with("v", "__c1", lambda a, b: a - b),
            "r",
        ).select("id", "r")
        cents2 = kmeans_centroids(res, n_fine, iters, vec_col="r", id_col="id")
        return cents1, cents2
    finally:
        c.unpersist()


def topk_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> DataFrame:
    """IVF top-k with learned (k-means) centroids: train the coarse
    quantizer (on a deterministic hash sample when ``sample_mod`` is
    set — see :func:`kmeans_centroids`), assign corpus and queries to
    their nearest centroid, probe only the query's cell.  Same output
    shape as the other top-k variants.  At scale: train on a sample,
    write the corpus partitioned by ``cid``, and probes become
    partition-pruned reads.
    """
    cents = kmeans_centroids(corpus, n_clusters, iters, vec_col, id_col, sample_mod)
    c = assign_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ),
        cents,
        vec_col="cv",
    ).withColumn("n2c", dot(F.col("cv"), F.col("cv")))
    q = assign_cells(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ),
        cents,
        vec_col="qv",
    ).withColumn("n2q", dot(F.col("qv"), F.col("qv")))
    joined = c.join(F.broadcast(q), "cid").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = _pair_cosine("qv", "cv")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def sq8_reconstructed(vec: Column) -> Column:
    """Symmetric per-vector int8 quantize-dequantize — the corpus-side
    code path of an IVF-SQ8 index: ``scale = max|x|/127``, codes =
    clamp(half-up(x/scale)), reconstructed value = ``code * scale``.

    Same rule as :func:`..embeddings.quantize_int8` (which emits the
    summary scalars; this emits the reconstructed vector the probe
    scores against).  Every step is exact IEEE arithmetic on
    deterministic inputs, so the DuckDB oracle replays the codes and
    the reconstruction bit for bit."""
    scale = F.array_max(F.transform(vec, lambda x: F.abs(x))) / F.lit(127.0)
    codes = F.transform(
        vec,
        lambda x: F.when(scale == 0, F.lit(0).cast("long")).otherwise(
            F.greatest(
                F.lit(-127).cast("long"),
                F.least(
                    F.lit(127).cast("long"),
                    F.floor(x / scale + F.lit(0.5)).cast("long"),
                ),
            )
        ),
    )
    return F.transform(codes, lambda q: q.cast("double") * scale)


def topk_ivf_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> DataFrame:
    """IVF-SQ8 approximate top-k: learned coarse cells + int8
    scalar-quantized corpus vectors, asymmetric scoring (full-precision
    query against dequantized neighbor).

    This is the MEMORY tier of the ANN stack: at 100 TB the index
    stores ``(cid, scale, int8 codes)`` — 4x less IO and cache
    footprint than raw floats — and a probe reads one cell's codes,
    dequantizes on the fly, and never touches the full-precision
    corpus (here the reconstruction is fused into the scan
    expression; a deployment writes the codes table partitioned by
    ``cid`` so probes are partition-pruned reads).  Training/assign
    reuse the deterministic Lloyd machinery; same output shape as the
    other top-k variants, with the cosine being the SQ8-approximate
    score.
    """
    cents = kmeans_centroids(corpus, n_clusters, iters, vec_col, id_col, sample_mod)
    c = assign_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ),
        cents,
        vec_col="cv",
    ).select(
        "cid", "neighbor_id", sq8_reconstructed(F.col("cv")).alias("rv")
    )
    # rv is DERIVED: no norm precompute (see topk_bruteforce's
    # precompute_n2 note — inlining would re-quantize twice per row).
    q = assign_cells(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ),
        cents,
        vec_col="qv",
    )
    joined = c.join(F.broadcast(q), "cid").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("rv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def probe_buckets(vec: Column, dims: tuple[int, ...] = (1, 17, 33, 49)) -> Column:
    """The query's bucket plus every Hamming-1 neighbor (one sign bit
    flipped) — 1 + len(dims) probes."""
    bits = [(F.element_at(vec, d) >= 0).cast("int") for d in dims]

    def key(flip: int | None) -> Column:
        parts = [
            (F.lit(1) - b if i == flip else b).cast("string")
            for i, b in enumerate(bits)
        ]
        return F.concat(*parts)

    return F.array(key(None), *[key(j) for j in range(len(dims))])


def topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (1, 17, 33, 49),
) -> DataFrame:
    """Multi-probe bucketed top-k: probe the query's bucket and all
    Hamming-1 buckets.

    Recovers most of the recall a single probe loses to vectors
    sitting just across one hyperplane, at ~(1+len(dims))x the probe
    cost — still a tiny fraction of brute force.  Each corpus row has
    exactly one bucket, so a (query, neighbor) pair matches at most
    one probe: no post-dedup needed.  The probe fan-out lives on the
    broadcast (query) side; the corpus still never shuffles.
    """
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn("bucket", sign_bucket(F.col("cv"), dims))
        .withColumn("n2c", dot(F.col("cv"), F.col("cv")))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("n2q", dot(F.col("qv"), F.col("qv")))
        .withColumn("bucket", F.explode(probe_buckets(F.col("qv"), dims)))
    )
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = _pair_cosine("qv", "cv")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (1, 17, 33, 49),
) -> DataFrame:
    """IVF/LSH-style approximate top-k: probe only the query's bucket.

    Same output shape as :func:`topk_bruteforce`; recall is whatever
    the quantizer gives (single-probe).  At scale, write the corpus
    bucketed/partitioned by this key so a probe is a partition-pruned
    read instead of a shuffle."""
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn("bucket", sign_bucket(F.col("cv"), dims))
        .withColumn("n2c", dot(F.col("cv"), F.col("cv")))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("bucket", sign_bucket(F.col("qv"), dims))
        .withColumn("n2q", dot(F.col("qv"), F.col("qv")))
    )
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = _pair_cosine("qv", "cv")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def knn_label_agreement(
    emb: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    dims: tuple[int, ...] | None = None,
    dim: int = 64,
    corpus_count: int | None = None,
    target_bucket_size: int = 32,
    max_bucket: int | None = 1000,
    probes: int = 1,
) -> DataFrame:
    """Label-noise detection via in-bucket kNN label agreement: for
    every vector, the fraction of its k nearest same-bucket neighbors
    (cosine, sign-LSH cells — :func:`topk_bucketed`'s quantizer) that
    carry the SAME label.  Rows with low agreement are the mislabeled
    / out-of-distribution candidates a training-data pipeline
    quarantines before fitting a quality or domain classifier on the
    corpus (the kNN-agreement shape behind deep-kNN label-noise
    filtering and Confident-Learning-style audits).

    ``probes`` > 1 enables multi-probe LSH (the SemDeDup fine-probe
    idea applied to the sign quantizer): probe ``i`` additionally
    searches the adjacent cell that flips the vector's
    ``i``-th-smallest-|margin| plane bit — exactly the neighbors a
    plane-straddling vector loses to quantization, which are the
    borderline rows this audit exists to score.  Candidates stay
    exact-scored (cosine), so extra probes only ADD true neighbors;
    each vector's k-best merge across its probed cells is
    deterministic (probe cells are distinct by construction and every
    neighbor is a member of exactly one home cell, so no candidate
    dedup is needed).

    Output: one row per vector — ``(vec_id, label, n_neighbors,
    agreement)``; ``agreement`` is NULL when the vector has no
    neighbors (singleton bucket, or its buckets were dropped by
    ``max_bucket`` — the degenerate-bucket cap shared with
    :func:`~.dedup.embedding_neardup_pairs`: an over-occupied cell
    is boilerplate whose quadratic neighbor scan would dominate the
    job for rows the audit should flag by other means; occupancy is
    counted over a cell's HOME members, never probe visitors).

    Preconditions (oracle parity): embedding elements must be
    non-NULL (a NULL element would silently shorten the Spark-side
    ``concat_ws`` sign key where a SQL CASE emits a bit) and vectors
    must have non-zero norm (zero-norm cosine is NaN, whose sort
    placement is engine-specific).  Both hold for any L2-normalized
    embedding column; filter degenerate vectors first otherwise.

    Scale shape: the corpus shuffles ONCE on the cell key (vectors
    ride a single exchange; ``probes`` replicates each vector
    ``probes``-fold into that exchange — a constant factor, not a
    growth term); each cell's kNN runs inside one higher-order
    expression over the collected cell (occupancy is held
    ~``target_bucket_size`` by the corpus-scaled plane count, the
    :func:`~.dedup.auto_bands` rule, so per-cell work is constant as
    N grows).  Single-probe finishes agreement in the same pass — no
    candidate-pair relation, no per-row window, ZERO joins
    (plan-pinned); multi-probe adds ONE more exchange (k-capped
    per-cell candidate lists regrouped by vector id — k structs per
    probe per vector, model-sized) and still zero joins.  With
    ``dims`` given the quantizer is fixed (the unit-test lane);
    default derives the plane count from ``corpus_count`` (pass it
    from footer metadata for a zero-job plan, else one ``count()``
    runs).
    """
    from .dedup import auto_bands

    if dims is None:
        n = corpus_count if corpus_count is not None else emb.count()
        dims = auto_bands(dim, n, 1, target_bucket_size)[0]
    probes = max(1, min(probes, len(dims) + 1))
    # Sign key on the RAW stored array — one expr string, scalar-only
    # promotion (the embedding_neardup_pairs key shape: a per-plane
    # array cast re-materializes the vector 2x per plane per row).
    bits = ",".join(
        f"cast(cast((element_at(`{vec_col}`,{d}) >= 0.0D) as int) as string)"
        for d in dims
    )
    key = F.expr(f"concat_ws('',{bits})")
    # Squared norm per VECTOR, before the groupBy: higher-order folds
    # are interpreted (never codegen'd), so a cosine that re-folds
    # dot(x,x) and dot(y,y) per PAIR costs 3x the lambda evaluations
    # of a dot-only pair scan (measured 5.5s -> ~2s at sf0.1).  Same
    # fold, same value — dividing by sqrt(n2a * n2b) is bit-identical
    # to computing the self-dots in place.
    vd = F.col(vec_col).cast("array<double>")

    def _neigh_structs(x, members):
        # candidate structs for x, sorted best-first by (1 - cosine,
        # neighbor id): 1 - cosine never produces -0.0 (cosine 0 ->
        # 1.0, cosine 1 -> +0.0), so the struct sort orders
        # identically in both engines.
        return F.transform(
            members,
            lambda y: F.struct(
                (
                    F.lit(1.0)
                    - F.round(
                        dot(x["v"], y["v"]) / F.sqrt(x["n2"] * y["n2"]), 6
                    )
                ).alias("d"),
                y["id"].alias("ib"),
                (y["label"] == x["label"]).cast("int").alias("same"),
            ),
        )

    def _finish(top):
        # (n_neighbors, agreement) from a sorted k-capped struct list
        n_nb = F.size(top)
        agree = F.when(
            n_nb > 0,
            F.round(
                F.aggregate(top, F.lit(0), lambda acc, s: acc + s["same"]).cast(
                    "double"
                )
                / n_nb,
                6,
            ),
        )
        return n_nb.cast("long").alias("n_neighbors"), agree.alias("agreement")

    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        vd.alias("v"),
        dot(vd, vd).alias("n2"),
        key.alias("bucket"),
    )

    if probes == 1:
        cells = base.groupBy("bucket").agg(
            F.collect_list(F.struct("id", "label", "v", "n2")).alias("ms")
        )
        ms = F.col("ms")
        cap = (
            F.size(ms) <= F.lit(max_bucket)
            if max_bucket is not None
            else F.lit(True)
        )

        def _one(x):
            # neighbors of x: every other cell member, scored once;
            # the cap predicate empties the list for over-occupied
            # cells without dropping x's output row.
            neigh = _neigh_structs(
                x, F.filter(ms, lambda y: (y["id"] != x["id"]) & cap)
            )
            top = F.slice(F.sort_array(neigh), 1, k)
            n_nb, agree = _finish(top)
            return F.struct(
                x["id"].alias("vec_id"),
                x["label"].alias("label"),
                n_nb,
                agree,
            )

        return cells.select(
            F.explode(F.transform(ms, _one)).alias("r")
        ).select("r.*")

    # Multi-probe: replicate each vector into its home cell (member +
    # query) and the probes-1 adjacent bit-flip cells (query only),
    # rank plane margins once per vector (|element| ascending, plane
    # position tie-break — the same first-position argmin rule the
    # oracle's CASE chain replays).
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(F.element_at(F.col("v"), d)).alias("m"),
                    F.lit(j + 1).alias("p"),
                )
                for j, d in enumerate(dims)
            ]
        )
    )
    home = base.withColumn("is_home", F.lit(True))
    reps = [home]
    withrk = base.withColumn("rk", ranked)
    for i in range(1, probes):
        flipped = F.expr(
            f"concat(substr(bucket, 1, rk[{i - 1}].p - 1),"
            f" case when substr(bucket, rk[{i - 1}].p, 1) = '1'"
            f" then '0' else '1' end,"
            f" substr(bucket, rk[{i - 1}].p + 1))"
        )
        reps.append(
            withrk.withColumn("bucket", flipped)
            .drop("rk")
            .withColumn("is_home", F.lit(False))
        )
    rows = reps[0]
    for r in reps[1:]:
        rows = rows.unionByName(r)

    cells = rows.groupBy("bucket").agg(
        F.collect_list(F.struct("id", "label", "v", "n2", "is_home")).alias(
            "ms"
        )
    )
    ms = F.col("ms")
    # Hoist the home-member array and the occupancy-cap predicate into
    # per-cell COLUMNS: referenced as expression trees inside the
    # per-candidate lambda below, `filter(ms, is_home)` re-materialized
    # per (x, y) evaluation — the cap alone cost O(m) per candidate,
    # O(m^3) per cell (measured ~1.3 s of the 2-probe audit's exec at
    # sf0.1).  As projected columns both evaluate once per cell row and
    # bind as O(1) references; values are bit-identical.
    cells = cells.withColumn(
        "__members", F.filter(ms, lambda y: y["is_home"])
    ).withColumn(
        "__cap",
        F.size(F.col("__members")) <= F.lit(max_bucket)
        if max_bucket is not None
        else F.lit(True),
    )
    members = F.col("__members")
    cap = F.col("__cap")

    def _partial(x):
        # per-(vector, probed-cell) k-best candidates vs the cell's
        # HOME members; k-capping before the regroup bounds the
        # second exchange at k structs per probe per vector.
        neigh = _neigh_structs(
            x, F.filter(members, lambda y: (y["id"] != x["id"]) & cap)
        )
        return F.struct(
            x["id"].alias("vec_id"),
            x["label"].alias("label"),
            F.slice(F.sort_array(neigh), 1, k).alias("cand"),
        )

    partials = cells.select(
        F.explode(F.transform(ms, _partial)).alias("r")
    ).select("r.*")
    merged = partials.groupBy("vec_id").agg(
        F.first("label").alias("label"),
        F.slice(
            F.sort_array(F.flatten(F.collect_list("cand"))), 1, k
        ).alias("top"),
    )
    n_nb, agree = _finish(F.col("top"))
    return merged.select("vec_id", "label", n_nb, agree)


# Session cache of persisted-index centroids keyed by index root.
# Entries carry the committed version they were read under, so any
# rebuild or append (both flip the version pointer) invalidates
# naturally; a cache hit makes the probe path's centroid load ZERO
# Spark jobs (build primes it, so build→query in one session never
# re-reads what the driver just computed).
_CENTROID_CACHE: dict[str, tuple[str, list[list[float]]]] = {}

# Sidecar name for the centroid relation inside the index table's
# version dir (underscore prefix = invisible to the codes scan).
_CENTROIDS_SIDECAR = "_centroids"

# Sidecar recording what corpus/parameters a generation was built
# from — the staleness witness for ensure_ivf_sq8_index.
_BUILD_META_SIDECAR = "_build_meta"


def _ivf_index_table(index_root: str):
    import os

    from ..io.table import ParquetTable

    return ParquetTable(os.path.join(index_root, "index"))


def _read_sidecar_local(tbl, name: str):
    """Read a sidecar as a pyarrow Table on the DRIVER — zero Spark
    jobs; sidecars are model-sized by construction."""
    import os

    import pyarrow.parquet as pq

    d = tbl.data_dir()
    if d is None:
        raise FileNotFoundError(f"table has no committed version: {tbl.path}")
    return pq.read_table(os.path.join(d, name))


def _load_index_centroids(
    spark: "SparkSession", index_root: str
) -> list[list[float]]:
    """Centroids of the CURRENT index generation, cache-first; a cold
    cache reads the sidecar parquet driver-locally (still zero Spark
    jobs)."""
    tbl = _ivf_index_table(index_root)
    ver = tbl.current_version()
    if ver is None:
        raise FileNotFoundError(f"no committed index under {index_root}")
    hit = _CENTROID_CACHE.get(index_root)
    if hit is not None and hit[0] == ver:
        return hit[1]
    t = _read_sidecar_local(tbl, _CENTROIDS_SIDECAR).to_pylist()
    cents = [list(r["centroid"]) for r in sorted(t, key=lambda r: r["cid"])]
    _CENTROID_CACHE[index_root] = (ver, cents)
    return cents


def _guarded_query_side(
    spark: "SparkSession", q: DataFrame, max_collect_queries: int | None
):
    """Size-guarded query side for the persisted-index probes.

    Interactive top-k batches (queries ≪ corpus) take the collect fast
    path: one ``limit(guard+1)`` job whose rows serve both the probed-
    cell literal (parquet partition pruning needs literals) and the
    scoring join's broadcast side — the historical plan, bit-identical
    results.  A batch-scoring call whose assigned query rows EXCEED
    the guard never serializes through the driver: the assignment is
    persisted once, the prune literal comes from ``distinct cid``
    (bounded by the CENTROID count — model-sized — regardless of query
    rows), and the scoring join runs as a regular distributed equi-join
    on ``cid`` (AQE picks the strategy).  Both lanes read only the
    probed cells' partitions.

    Returns ``(query_side_df, probed_cells, big)``.
    """
    if max_collect_queries is not None:
        qrows = q.limit(max_collect_queries + 1).collect()
        if len(qrows) <= max_collect_queries:
            probed = sorted({r.cid for r in qrows})
            # qv doubles round-trip bit-exactly through collect
            # (Python floats ARE IEEE doubles)
            return (
                F.broadcast(spark.createDataFrame(qrows, schema=q.schema)),
                probed,
                False,
            )
    big = q.persist()
    probed = sorted(r.cid for r in big.select("cid").distinct().collect())
    return big, probed, True


def corpus_fingerprint(
    corpus: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> tuple[int, int]:
    """Exact, order-insensitive corpus identity: ``(row count,
    sum of xxhash64(id, vector))`` — one cheap aggregate job.  Any
    added/removed/changed vector changes the sum (up to 64-bit hash
    collision); partitioning and row order do not.  This is what lets
    :func:`ensure_ivf_sq8_index` prove an existing index generation
    was built from THIS corpus without re-reading it."""
    row = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: a plain long sum of 64-bit hashes
        # overflows under ANSI after a handful of rows
        F.sum(
            F.xxhash64(F.col(id_col), F.col(vec_col)).cast("decimal(38,0)")
        ).alias("h"),
    ).first()
    return (int(row.n), int(row.h) if row.h is not None else 0)


def _ensure_index(
    corpus: DataFrame,
    index_root: str,
    vec_col: str,
    id_col: str,
    params: dict,
    build,
) -> bool:
    """Build-if-stale core shared by the persisted index tiers:
    rebuild (via ``build(meta)``) only when the corpus fingerprint or
    the build parameters differ from what the current generation
    records in its ``_build_meta`` sidecar.  Returns True iff a
    rebuild happened.

    This is the build-once/query-many contract made literal: a serving
    deployment calls ``ensure`` + probe, paying one fingerprint
    aggregate (exact — see :func:`corpus_fingerprint`) on the hot
    path and the full train+assign+write only when the corpus actually
    moved.  Appends flip the version pointer but keep the ORIGINAL
    build's meta, so a later ensure() against the grown corpus
    correctly sees a stale fingerprint and retrains.
    """
    n, h = corpus_fingerprint(corpus, vec_col, id_col)
    # corpus_hash stringified: the summed 64-bit hashes exceed int64
    meta = {"n_rows": n, "corpus_hash": str(h), **params}
    tbl = _ivf_index_table(index_root)
    if tbl.current_version() is not None:
        try:
            got = _read_sidecar_local(tbl, _BUILD_META_SIDECAR).to_pylist()
        except Exception:
            # no/unreadable meta (e.g. a pre-meta generation): rebuild
            got = []
        if got and all(got[0].get(k) == v for k, v in meta.items()):
            return False
    build(meta)
    return True


def ensure_ivf_sq8_index(
    corpus: DataFrame,
    index_root: str,
    n_clusters: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> bool:
    """:func:`_ensure_index` over :func:`build_ivf_sq8_index`."""
    params = {
        "n_clusters": int(n_clusters),
        "iters": int(iters),
        "sample_mod": -1 if sample_mod is None else int(sample_mod),
    }
    return _ensure_index(
        corpus,
        index_root,
        vec_col,
        id_col,
        params,
        lambda meta: build_ivf_sq8_index(
            corpus, index_root, n_clusters, iters, vec_col, id_col,
            sample_mod, _meta=meta,
        ),
    )


def ensure_centroid_model(
    corpus: DataFrame,
    model_root: str,
    n_clusters: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Train-once/reuse-many coarse quantizer WITHOUT a per-vector
    payload: the :func:`_ensure_index` fingerprint gate over bare
    :func:`kmeans_centroids`, returning the model.

    The persisted ANN tiers (:func:`ensure_ivf_sq8_index`,
    :func:`ensure_ivf_pq_index`) store the quantizer alongside a
    corpus-sized code table because probes read the codes.  The audit
    consumers (:func:`..embeddings.embedding_outlier_ranks` under the
    ``audit_quarantine_curate`` capstone) need only the CENTROIDS —
    assignment happens inline against the live corpus — so persisting
    codes would be pure write amplification.  This tier commits just
    the model-sized centroid relation (rows AND the standard
    ``_centroids`` sidecar, so :func:`_load_index_centroids` and
    :data:`_CENTROID_CACHE` serve warm calls with zero Spark jobs)
    under the usual ``_build_meta`` fingerprint; the warm path costs
    one :func:`corpus_fingerprint` aggregate instead of the full
    sampled-Lloyd training, and a changed corpus retrains exactly as
    the serving contract requires.  Training is deterministic
    (:func:`kmeans_centroids`), so a cold build, a warm load, and an
    oracle replaying the training from SQL all yield bit-identical
    centroids."""
    params = {
        "kind": "centroid_model",
        "n_clusters": int(n_clusters),
        "iters": int(iters),
        "sample_mod": -1 if sample_mod is None else int(sample_mod),
    }

    def _build(meta: dict) -> None:
        import pyarrow as pa

        cents = kmeans_centroids(
            corpus, n_clusters, iters, vec_col, id_col, sample_mod
        )
        if not cents:
            raise ValueError(
                "ensure_centroid_model: corpus (or its sample_mod "
                "sample) is empty — nothing to train the quantizer on"
            )
        rows = corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cid INT, centroid array<double>",
        ).coalesce(1)
        cdf = pa.table(
            {
                "cid": pa.array(range(len(cents)), type=pa.int32()),
                "centroid": pa.array(
                    [[float(x) for x in c] for c in cents],
                    type=pa.list_(pa.float64()),
                ),
            }
        )
        tbl = _ivf_index_table(model_root)
        tbl.overwrite(
            rows,
            sidecars={
                _CENTROIDS_SIDECAR: cdf,
                _BUILD_META_SIDECAR: pa.table(
                    {k: [v] for k, v in meta.items()}
                ),
            },
        )
        ver = tbl.current_version()
        if ver is not None:
            _CENTROID_CACHE[model_root] = (ver, [list(c) for c in cents])

    _ensure_index(corpus, model_root, vec_col, id_col, params, _build)
    return _load_index_centroids(corpus.sparkSession, model_root)


def build_ivf_sq8_index(
    corpus: DataFrame,
    index_root: str,
    n_clusters: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
    _meta: dict | None = None,
) -> None:
    """Build a PERSISTED IVF-SQ8 index: train the deterministic Lloyd
    quantizer, assign every corpus vector to its cell, scalar-quantize
    to int8 codes, and write the index PARTITIONED BY ``cid`` — the
    build-once/query-many separation every 100 TB ANN deployment needs
    (the per-call variants :func:`topk_kmeans`/:func:`topk_ivf_sq8`
    re-train and re-assign on every query batch, which is the right
    shape for one-shot analytics and the wrong one for serving).

    Layout under ``index_root``: ONE :class:`..io.table.ParquetTable`
    ``index`` holding ``(cid, neighbor_id, scale, codes
    array<tinyint>)`` partitioned by ``cid``, with the centroid
    relation ``(cid, centroid array<double>)`` committed as a SIDECAR
    inside the same version directory — a single CAS pointer governs
    both, so no reader can ever pair one generation's codes with
    another's centroids (two separately-committed tables had exactly
    that race between their commits).  Rebuilds are atomic swaps;
    retention/vacuum/time travel apply to index generations like any
    other managed table.

    The int8 tier stores ~4x less than raw doubles; a probe reads one
    cell's partition (pruned at the parquet-metadata level — pinned by
    plan test) and dequantizes in the scan expression.
    """
    cents = kmeans_centroids(corpus, n_clusters, iters, vec_col, id_col, sample_mod)
    if not cents:
        # an empty quantizer would "build" an index every later query
        # crashes on — fail at build time with the actionable message
        raise ValueError(
            "build_ivf_sq8_index: corpus (or its sample_mod sample) is "
            "empty — nothing to train the quantizer on"
        )
    assigned = assign_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ),
        cents,
        vec_col="cv",
    )
    scale = F.array_max(F.transform(F.col("cv"), lambda x: F.abs(x))) / F.lit(127.0)
    codes = F.transform(
        F.col("cv"),
        lambda x: F.when(scale == 0, F.lit(0).cast("tinyint")).otherwise(
            F.greatest(
                F.lit(-127).cast("tinyint"),
                F.least(
                    F.lit(127).cast("tinyint"),
                    F.floor(x / scale + F.lit(0.5)).cast("tinyint"),
                ),
            )
        ),
    )
    # partitionBy(cid) from the input's own task layout: each task
    # contributes one file per cell it touches, so files-per-cell
    # scales with the corpus (a deliberate NON-repartition — one task
    # per cell would serialize a 100 TB build on its biggest cell,
    # and the probe prunes at the directory level either way)
    rows = assigned.select(
        "cid",
        "neighbor_id",
        scale.alias("scale"),
        codes.alias("codes"),
    )
    import pyarrow as pa

    # the centroids are driver-resident model bytes — a pyarrow
    # sidecar writes them with zero Spark jobs
    cdf = pa.table(
        {
            "cid": pa.array(range(len(cents)), type=pa.int32()),
            "centroid": pa.array(
                [[float(x) for x in c] for c in cents],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    sidecars = {_CENTROIDS_SIDECAR: cdf}
    if _meta is not None:
        sidecars[_BUILD_META_SIDECAR] = pa.table(
            {k: [v] for k, v in _meta.items()}
        )
    tbl = _ivf_index_table(index_root)
    tbl.overwrite(rows, partition_by=("cid",), sidecars=sidecars)
    ver = tbl.current_version()
    if ver is not None:
        _CENTROID_CACHE[index_root] = (ver, [list(c) for c in cents])


def topk_ivf_sq8_index(
    spark: "SparkSession",
    index_root: str,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probes: int = 1,
    max_collect_queries: int | None = 8192,
) -> DataFrame:
    """Query a :func:`build_ivf_sq8_index` index: assign each query to
    its nearest persisted centroid(s), read ONLY the probed cells'
    partitions (the cid list is a literal ``isin`` so partition
    pruning happens at parquet metadata — cells no query probes are
    never read, the plan-test-pinned point of persisting), dequantize
    in the scan expression, and window the asymmetric cosine to the
    top ``k``.  With ``probes=1``, bit-identical results to
    :func:`topk_ivf_sq8` run with the same parameters — pinned by the
    shared oracle.  ``probes > 1`` explodes each query over its
    nearest cells (:func:`assign_cells_multi`) — the recall lever for
    queries near a cell boundary, at the cost of reading that many
    partitions; results are a superset-derived refinement (never worse
    recall, pinned by test).

    Driver round-trips per probe: the centroid load is cache-first
    (ZERO jobs when this session built or already probed this index
    generation — :data:`_CENTROID_CACHE`), and the assigned query
    batch is collected ONCE when it fits ``max_collect_queries`` — the
    same rows serve both the probed-cell discovery (the cid list must
    be a LITERAL for parquet partition pruning) and the scoring join's
    broadcast side, so the scoring job re-executes no query lineage.
    Total: one small assignment job + the scoring job.  Assigned query
    rows EXCEEDING the guard never serialize through the driver: see
    :func:`_guarded_query_side` — prune literal from model-sized
    ``distinct cid``, distributed equi-join for scoring; per-call
    results are identical either way (pytest-pinned).
    """
    cents = _load_index_centroids(spark, index_root)
    qsel = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    if probes > 1:
        q = assign_cells_multi(qsel, cents, probes, vec_col="qv")
    else:
        q = assign_cells(qsel, cents, vec_col="qv")
    qside, probed_cells, _big = _guarded_query_side(
        spark, q, max_collect_queries
    )
    idx = (
        _ivf_index_table(index_root)
        .read(spark)
        .filter(F.col("cid").isin(probed_cells))
    )
    # rv is DERIVED (dequantized in the scan): no norm precompute —
    # see topk_bruteforce's precompute_n2 note.
    rv = F.transform(F.col("codes"), lambda c: c.cast("double") * F.col("scale"))
    joined = (
        idx.select("cid", "neighbor_id", rv.alias("rv"))
        .join(qside, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("rv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def append_to_ivf_sq8_index(
    new_vectors: DataFrame,
    index_root: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incrementally extend a persisted :func:`build_ivf_sq8_index`
    index: assign the NEW vectors against the already-trained
    centroids (the current generation's sidecar, cache-first — no
    retraining, no touch of existing cells' data) and append their
    int8 codes to the cid partitions.  The ingest-path companion of
    the atomic rebuild: a 100 TB deployment appends each arriving
    batch and schedules full retrains on drift, exactly like
    :func:`..dedup.incremental` skips re-hashing the existing corpus.

    The append is a VERSIONED commit (``ParquetTable.append_commit``:
    hardlink copy-on-write of the current generation + CAS pointer
    flip), so concurrent readers see either the old generation or
    old+batch, never a partial batch — in-place ``append`` could not
    make that promise.  Quantizer drift is the operator's documented
    trade: new vectors land in the nearest EXISTING cell; recall
    degrades only as the data distribution moves, which the recall@k
    evaluation query measures.
    """
    spark = new_vectors.sparkSession
    cents = _load_index_centroids(spark, index_root)
    assigned = assign_cells(
        new_vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ),
        cents,
        vec_col="cv",
    )
    scale = F.array_max(F.transform(F.col("cv"), lambda x: F.abs(x))) / F.lit(127.0)
    codes = F.transform(
        F.col("cv"),
        lambda x: F.when(scale == 0, F.lit(0).cast("tinyint")).otherwise(
            F.greatest(
                F.lit(-127).cast("tinyint"),
                F.least(
                    F.lit(127).cast("tinyint"),
                    F.floor(x / scale + F.lit(0.5)).cast("tinyint"),
                ),
            )
        ),
    )
    rows = assigned.select(
        "cid", "neighbor_id", scale.alias("scale"), codes.alias("codes")
    )
    tbl = _ivf_index_table(index_root)
    tbl.append_commit(rows, partition_by=("cid",))
    ver = tbl.current_version()
    if ver is not None:
        # same centroids, new generation — keep the cache warm
        _CENTROID_CACHE[index_root] = (ver, cents)


# ---------------------------------------------------------------------------
# Persisted IVFPQ index — the 100 TB memory tier of the serving story:
# coarse cells prune the scan (like SQ8) but each cell stores m
# log2(k_cb)-bit PQ codes of the RESIDUAL instead of 8 bits/dim, the
# FAISS IVFPQ layout.  Same single-pointer commit discipline as the
# SQ8 index: codes + coarse centroids + per-subspace codebooks +
# build meta all live in ONE version directory.

# Sidecar holding the per-subspace PQ codebooks (s, cid, centroid).
_PQ_CODEBOOKS_SIDECAR = "_codebooks"

# Session cache of persisted PQ codebooks, versioned like
# _CENTROID_CACHE.
_CODEBOOK_CACHE: dict[str, tuple[str, list[list[list[float]]]]] = {}


def _load_index_codebooks(
    spark: "SparkSession", index_root: str
) -> list[list[list[float]]]:
    """PQ codebooks of the CURRENT index generation, cache-first; a
    cold cache reads the sidecar driver-locally (zero Spark jobs)."""
    tbl = _ivf_index_table(index_root)
    ver = tbl.current_version()
    if ver is None:
        raise FileNotFoundError(f"no committed index under {index_root}")
    hit = _CODEBOOK_CACHE.get(index_root)
    if hit is not None and hit[0] == ver:
        return hit[1]
    rows = _read_sidecar_local(tbl, _PQ_CODEBOOKS_SIDECAR).to_pylist()
    m = 1 + max(r["s"] for r in rows)
    books: list[list[list[float]]] = [[] for _ in range(m)]
    for r in sorted(rows, key=lambda r: (r["s"], r["cid"])):
        books[r["s"]].append(list(r["centroid"]))
    _CODEBOOK_CACHE[index_root] = (ver, books)
    return books


def _pq_encode_codes(m: int, sub: int) -> Column:
    """PQ code array for a residual column ``r`` against broadcast
    ``__books``: ``codes[s] = argmin_dist(r[s·sub+1 : +sub],
    books[s])`` — the exact argmin :func:`pq_reconstruct` uses, so a
    probe reconstructing ``books[s][codes[s]]`` is bit-identical to
    the per-call reconstruction."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _argmin_dist(
            F.slice(F.col("r"), s * sub + 1, sub),
            F.element_at(F.col("__books"), s + 1),
        ),
    )


def build_ivf_pq_index(
    corpus: DataFrame,
    index_root: str,
    n_clusters: int = 8,
    m: int = 4,
    k_cb: int = 8,
    iters: int = 3,
    pq_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
    _meta: dict | None = None,
) -> None:
    """Build a PERSISTED IVFPQ index: train the coarse quantizer,
    assign every vector, PQ-train on the RESIDUALS (cell-diameter
    magnitudes — finer resolution per codebook bit than raw-vector
    PQ), and store only ``(cid, neighbor_id, codes array<int>)``
    partitioned by ``cid`` — m·log2(k_cb) bits of payload per vector,
    the compression that fits a 1e11-vector index in cluster RAM
    (vs 8 bits/dim for the SQ8 tier).

    One CAS pointer governs everything: codes (main relation), coarse
    centroids, per-subspace codebooks, and build meta (sidecars inside
    the same version directory), so a probe can never mix quantizer
    generations.  Deterministic end to end (sampled Lloyd at both
    levels, first-wins argmin, round-6 means) — the probe path is
    bit-identical to :func:`topk_ivfpq` with the same parameters,
    pinned by the shared oracle.
    """
    import pyarrow as pa

    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = kmeans_centroids(corpus, n_clusters, iters, vec_col, id_col, sample_mod)
    if not cents:
        raise ValueError(
            "build_ivf_pq_index: corpus (or its sample_mod sample) is "
            "empty — nothing to train the quantizer on"
        )
    d = len(cents[0])
    if d % m:
        raise ValueError(f"build_ivf_pq_index: dim {d} not divisible by m={m}")
    sub = d // m
    spark = corpus.sparkSession
    cdf = spark.createDataFrame(
        [([[float(x) for x in cc] for cc in cents],)],
        "__cents: array<array<double>>",
    )
    # assigned+residual relation feeds the m subspace trainings AND the
    # code encode — materialize once
    t = (
        c.crossJoin(F.broadcast(cdf))
        .withColumn("cid", _argmin_dist(F.col("v"), F.col("__cents")))
        .withColumn("cc", F.element_at(F.col("__cents"), F.col("cid") + 1))
        .drop("__cents")
        .withColumn("r", F.zip_with("v", "cc", lambda a, b: a - b))
        .localCheckpoint(eager=False)
    )
    books = pq_codebooks(
        t.select(F.col("nid"), F.col("r")),
        m,
        k_cb,
        pq_iters,
        vec_col="r",
        id_col="nid",
        sample_mod=sample_mod,
    )
    bdf = spark.createDataFrame(
        [([[list(map(float, cc)) for cc in b] for b in books],)],
        "__books: array<array<array<double>>>",
    )
    rows = (
        t.crossJoin(F.broadcast(bdf))
        .withColumn("codes", _pq_encode_codes(m, sub))
        .select("cid", F.col("nid").alias("neighbor_id"), "codes")
    )
    cent_tbl = pa.table(
        {
            "cid": pa.array(range(len(cents)), type=pa.int32()),
            "centroid": pa.array(
                [[float(x) for x in cc] for cc in cents],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    book_tbl = pa.table(
        {
            "s": pa.array(
                [s for s in range(m) for _ in books[s]], type=pa.int32()
            ),
            "cid": pa.array(
                [i for s in range(m) for i in range(len(books[s]))],
                type=pa.int32(),
            ),
            "centroid": pa.array(
                [[float(x) for x in cc] for b in books for cc in b],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    sidecars = {_CENTROIDS_SIDECAR: cent_tbl, _PQ_CODEBOOKS_SIDECAR: book_tbl}
    if _meta is not None:
        sidecars[_BUILD_META_SIDECAR] = pa.table({k: [v] for k, v in _meta.items()})
    tbl = _ivf_index_table(index_root)
    tbl.overwrite(rows, partition_by=("cid",), sidecars=sidecars)
    ver = tbl.current_version()
    if ver is not None:
        _CENTROID_CACHE[index_root] = (ver, [list(cc) for cc in cents])
        _CODEBOOK_CACHE[index_root] = (ver, [[list(cc) for cc in b] for b in books])


def topk_ivf_pq_index(
    spark: "SparkSession",
    index_root: str,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probes: int = 1,
    max_collect_queries: int | None = 8192,
) -> DataFrame:
    """Query a :func:`build_ivf_pq_index` index: assign each query to
    its nearest persisted coarse centroid(s), read ONLY the probed
    cells' partitions (literal ``isin`` → parquet partition pruning,
    plan-pinned), reconstruct each stored vector IN the scan
    expression (``cents[cid] + concat_s books[s][codes[s]]`` — both
    model levels ride one broadcast data row), and window the
    asymmetric cosine to the top ``k``.  With ``probes=1``,
    bit-identical to :func:`topk_ivfpq` run with the same parameters —
    pinned by the shared oracle.  Same driver-round-trip and
    size-guard shape as the SQ8 probe: cache-first model load (zero
    jobs), one assignment job whose collected rows serve both the
    prune literal and the scoring broadcast when the batch fits
    ``max_collect_queries``, else the :func:`_guarded_query_side`
    distributed lane (identical results, pytest-pinned).
    """
    cents = _load_index_centroids(spark, index_root)
    books = _load_index_codebooks(spark, index_root)
    m = len(books)
    qsel = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    if probes > 1:
        q = assign_cells_multi(qsel, cents, probes, vec_col="qv")
    else:
        q = assign_cells(qsel, cents, vec_col="qv")
    qside, probed_cells, _big = _guarded_query_side(
        spark, q, max_collect_queries
    )
    idx = (
        _ivf_index_table(index_root)
        .read(spark)
        .filter(F.col("cid").isin(probed_cells))
    )
    mdf = spark.createDataFrame(
        [(
            [[float(x) for x in cc] for cc in cents],
            [[list(map(float, cc)) for cc in b] for b in books],
        )],
        "__cents: array<array<double>>, __books: array<array<array<double>>>",
    )
    cc = F.element_at(F.col("__cents"), F.col("cid") + 1)
    rres = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.element_at(
                F.element_at(F.col("__books"), s + 1),
                F.element_at(F.col("codes"), s + 1) + 1,
            ),
        )
    )
    # cv is DERIVED (codebook lookups + add-back in the scan): no
    # norm precompute — see topk_bruteforce's precompute_n2 note.
    cv = F.zip_with(cc, rres, lambda a, b: a + b)
    joined = (
        idx.crossJoin(F.broadcast(mdf))
        .select("cid", "neighbor_id", cv.alias("cv"))
        .join(qside, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def append_to_ivf_pq_index(
    new_vectors: DataFrame,
    index_root: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incrementally extend a persisted IVFPQ index: assign the NEW
    vectors against the frozen coarse centroids, encode their
    residuals against the frozen codebooks, and publish old+batch via
    a versioned commit (``append_commit`` — hardlink copy-on-write,
    never a reader-visible partial batch).  Quantizer drift is the
    documented trade, exactly as for the SQ8 tier."""
    spark = new_vectors.sparkSession
    cents = _load_index_centroids(spark, index_root)
    books = _load_index_codebooks(spark, index_root)
    m = len(books)
    sub = len(books[0][0])
    cdf = spark.createDataFrame(
        [([[float(x) for x in cc] for cc in cents],)],
        "__cents: array<array<double>>",
    )
    bdf = spark.createDataFrame(
        [([[list(map(float, cc)) for cc in b] for b in books],)],
        "__books: array<array<array<double>>>",
    )
    rows = (
        new_vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .crossJoin(F.broadcast(cdf))
        .withColumn("cid", _argmin_dist(F.col("v"), F.col("__cents")))
        .withColumn("cc", F.element_at(F.col("__cents"), F.col("cid") + 1))
        .drop("__cents")
        .withColumn("r", F.zip_with("v", "cc", lambda a, b: a - b))
        .crossJoin(F.broadcast(bdf))
        .withColumn("codes", _pq_encode_codes(m, sub))
        .select("cid", "neighbor_id", "codes")
    )
    tbl = _ivf_index_table(index_root)
    tbl.append_commit(rows, partition_by=("cid",))
    ver = tbl.current_version()
    if ver is not None:
        # same models, new generation — keep both caches warm
        _CENTROID_CACHE[index_root] = (ver, cents)
        _CODEBOOK_CACHE[index_root] = (ver, books)


def ensure_ivf_pq_index(
    corpus: DataFrame,
    index_root: str,
    n_clusters: int = 8,
    m: int = 4,
    k_cb: int = 8,
    iters: int = 3,
    pq_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> bool:
    """:func:`_ensure_index` over :func:`build_ivf_pq_index`."""
    params = {
        "n_clusters": int(n_clusters),
        "pq_m": int(m),
        "pq_k_cb": int(k_cb),
        "iters": int(iters),
        "pq_iters": int(pq_iters),
        "sample_mod": -1 if sample_mod is None else int(sample_mod),
    }
    return _ensure_index(
        corpus,
        index_root,
        vec_col,
        id_col,
        params,
        lambda meta: build_ivf_pq_index(
            corpus, index_root, n_clusters, m, k_cb, iters, pq_iters,
            vec_col, id_col, sample_mod, _meta=meta,
        ),
    )
