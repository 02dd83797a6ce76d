"""Incremental curation == one-shot curation (llm/curate.py).

The standing-state batch step (exact dedup vs the persisted md5 set,
near-dup vs the persisted band index) must reproduce the stateless
one-shot chain exactly when batches arrive in ascending id ranges —
including the transitive-witness case where a near-dup-DROPPED doc
from an earlier batch is the witness that drops a later doc (the
index keeps every exact-survivor, not just curated output).

max_bucket=None everywhere: bucket capping is corpus-size dependent,
so it is the one documented bit-equivalence breaker.  bands=8 (r=1)
so LSH discovery probability at the test jaccards is ~1 and the
scenario assertions depend only on true Jaccard vs the threshold —
equivalence itself holds for ANY banding (both paths share the hash
family deterministically).
"""

from pyspark.sql import functions as F

from dax_ppdb_spark.llm.curate import curate_batch, curate_oneshot

PARAMS = dict(max_bucket=None, k=8, bands=8, n=3)


def _seg(tag: str, n: int) -> list[str]:
    return [f"{tag}{j}" for j in range(n)]


# Chain construction: doc9 = A+B, doc27 = B+C, doc40 = B[10:]+C+D.
# True 3-gram Jaccards (self-checked below): 0.611 / 0.579 / 0.286 —
# (9,27) and (27,40) above the 0.5 threshold, (9,40) below it — so 40
# is dropped ONLY via the dropped witness 27.
A, B, C, D = _seg("a", 4), _seg("b", 24), _seg("c", 10), _seg("d", 6)
CHAIN_9 = " ".join(A + B)
CHAIN_27 = " ".join(B + C)
CHAIN_40 = " ".join(B[10:] + C + D)
DUP = " ".join(_seg("shared", 30))


def _uniq(i: int) -> str:
    return " ".join(f"u{i}w{j}" for j in range(30))


def _jac(x: str, y: str) -> float:
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    a, b = sh(x), sh(y)
    return len(a & b) / len(a | b)


def _mk_docs(spark):
    rows = []
    # batch 1: ids 0-19
    for i in range(0, 8):
        rows.append((i, _uniq(i)))
    rows.append((8, DUP))
    rows.append((9, CHAIN_9))
    rows.append((10, "!!! ??? ### $$$ %%%"))  # fails quality
    # batch 2: ids 20-39
    for i in range(20, 26):
        rows.append((i, _uniq(i)))
    rows.append((26, DUP))  # exact dup of 8
    rows.append((27, CHAIN_27))  # near-dup of 9 -> dropped, stays a witness
    # batch 3: ids 40-59
    rows.append((40, CHAIN_40))  # near-dup of 27 only
    for i in range(41, 47):
        rows.append((i, _uniq(i)))
    rows.append((47, DUP))  # exact dup again
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chain_construction_has_the_intended_jaccards():
    assert _jac(CHAIN_9, CHAIN_27) >= 0.55
    assert _jac(CHAIN_27, CHAIN_40) >= 0.55
    assert _jac(CHAIN_9, CHAIN_40) <= 0.45


def test_incremental_equals_oneshot(spark, tmp_path):
    docs = _mk_docs(spark)
    state = str(tmp_path / "curation_state")

    kept = []
    for lo, hi in ((0, 20), (20, 40), (40, 60)):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        out = curate_batch(spark, batch, state, **PARAMS)
        kept.extend(r.doc_id for r in out.select("doc_id").collect())

    oneshot = sorted(
        r.doc_id
        for r in curate_oneshot(docs, **PARAMS).select("doc_id").collect()
    )
    assert sorted(kept) == oneshot

    # The chain actually exercised every rule:
    assert 10 not in oneshot  # quality-filtered
    assert 8 in oneshot and 26 not in oneshot and 47 not in oneshot  # exact
    assert 9 in oneshot and 27 not in oneshot  # near-dup vs batch 1
    # transitive witness: 40 is a near-dup of DROPPED 27 (not of 9) —
    # the standing index must still drop it.
    assert 40 not in oneshot
    assert len(oneshot) == 8 + 1 + 1 + 6 + 6  # per-group survivors


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    """Batch redelivery (the at-least-once ingest case): re-running a
    batch whose state commit already landed must return the SAME
    curated rows (self-matches never drop a doc) and must not grow the
    state (appends are keyed by doc_id) — the property that makes a
    partition-overwrite streaming sink exactly-once."""
    from dax_ppdb_spark.llm.curate import _seen_table

    docs = _mk_docs(spark).filter(F.col("doc_id") < 20)
    state = str(tmp_path / "curation_state")
    first = curate_batch(spark, docs, state, **PARAMS)
    ids_first = sorted(r.doc_id for r in first.select("doc_id").collect())
    n_seen = _seen_table(state).read(spark).count()
    again = curate_batch(spark, docs, state, **PARAMS)
    ids_again = sorted(r.doc_id for r in again.select("doc_id").collect())
    assert ids_first and ids_again == ids_first
    assert _seen_table(state).read(spark).count() == n_seen


def test_replay_of_early_batch_after_later_batches(spark, tmp_path):
    """The harder at-least-once case: replaying batch 1 AFTER batches
    2 and 3 extended the state.  Later-seen (higher-id) docs are in
    the index but must not retroactively drop the replayed batch's
    survivors — the probe's lower-id witness rule (corpus_id <
    new_id) is what pins this; a batch-membership filter alone fails
    it (doc 27 would drop its own witness doc 9)."""
    docs = _mk_docs(spark)
    state = str(tmp_path / "curation_state")
    outs = {}
    for lo, hi in ((0, 20), (20, 40), (40, 60)):
        out = curate_batch(
            spark,
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            state,
            **PARAMS,
        )
        outs[lo] = sorted(r.doc_id for r in out.select("doc_id").collect())
    replay = curate_batch(
        spark, docs.filter(F.col("doc_id") < 20), state, **PARAMS
    )
    assert sorted(r.doc_id for r in replay.select("doc_id").collect()) == outs[0]


def test_stream_curated_exactly_once(spark, tmp_path):
    """Streaming curation end to end: file-source micro-batches ->
    curate_batch -> per-batch dynamic-partition-overwrite sink.

    Drain 1 curates batch 1; drain 2 (same checkpoint) picks up only
    the newly landed file and dedups it against the standing state;
    deleting the checkpoint's LAST COMMIT MARKER (Spark's actual
    at-least-once case: the batch ran — sink and state committed —
    but the crash hit before the commit log advanced, so restart
    replays the SAME batch id with the same files) and draining again
    must leave the sink's curated id set IDENTICAL — idempotent
    curation + per-batch partition overwrite = exactly-once."""
    import os

    from dax_ppdb_spark.streaming import stream_curated

    docs = _mk_docs(spark)
    b1 = docs.filter(F.col("doc_id") < 20)
    b2 = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40))
    src = str(tmp_path / "landing")
    os.makedirs(src)
    sink = str(tmp_path / "curated")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        # availableNow terminates the query, but Spark 4's
        # one-query-per-checkpoint registry deregisters asynchronously
        # after awaitTermination returns — wait it out before the next
        # drain reuses the checkpoint.
        import time

        stream_curated(
            spark, src + "/*", docs.schema, ckpt, state, sink, **PARAMS
        )
        for _ in range(100):
            if not spark.streams.active:
                break
            time.sleep(0.1)
        return sorted(
            r.doc_id
            for r in spark.read.parquet(sink).select("doc_id").collect()
        )

    b1.coalesce(1).write.parquet(os.path.join(src, "b1"))
    ids1 = drain()
    assert 9 in ids1 and 10 not in ids1  # curated, not raw

    b2.coalesce(1).write.parquet(os.path.join(src, "b2"))
    ids2 = drain()
    assert set(ids1) < set(ids2)
    assert 26 not in ids2 and 27 not in ids2  # deduped vs standing state

    # Crash-replay: drop the newest commit marker so the restart
    # re-executes that micro-batch (same id, same files) against the
    # already-committed sink + state.
    commits = os.path.join(ckpt, "commits")
    newest = max(
        (f for f in os.listdir(commits) if f.isdigit()), key=int
    )
    os.remove(os.path.join(commits, newest))
    # ... and its Hadoop checksum sidecar: a stale .crc makes the
    # replay's atomic rename throw FileAlreadyExists, which Spark
    # surfaces as "multiple streaming queries concurrently using".
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    ids3 = drain()
    assert ids3 == ids2


def test_stream_curated_staging_crash_atomic(spark):
    """q_stream_curated's landing-file staging is crash-atomic: both
    batch files materialize under _stage/src and the COMPLETED
    directory renames into src in one os.rename.  A crash mid-staging
    therefore leaves no src at all (only _stage litter, cleared on
    rerun) — the pre-fix shape copied files into src one at a time,
    so a rerun after a crash between the two copies saw src present,
    skipped staging, drained only batch 0, and cached a silently
    wrong sink behind the _DRAINED marker."""
    import hashlib
    import os
    import shutil

    from pyspark.sql import functions as F

    from dax_ppdb_spark.driver_queries import all_queries

    sf = "/root/testdata/sf0.001"
    qs = all_queries()

    # Recompute the query's deterministic staging root so the test can
    # plant the crash state it is about to recover from.
    docs = (
        spark.read.parquet(os.path.join(sf, "documents.parquet"))
        .select("doc_id", "text")
    )
    n, fp = docs.agg(
        F.count(F.lit(1)),
        F.sum(F.xxhash64("doc_id", "text").cast("decimal(38,0)")),
    ).first()
    key = hashlib.md5(
        f"{os.path.realpath(sf)}|{n}|{fp}|stream".encode()
    ).hexdigest()[:16]
    root = os.path.join("/tmp", f"dax_ppdb_stream_curated_{key}")
    shutil.rmtree(root, ignore_errors=True)

    # Crash leftover: a half-populated _stage (one of two files), NO
    # src, no marker — the state an interrupted staging now leaves.
    half = os.path.join(root, "_stage", "src")
    os.makedirs(half)
    with open(os.path.join(half, "batch0.parquet"), "wb") as fh:
        fh.write(b"torn write")

    got = sorted(
        (r.doc_id, r.batch)
        for r in qs["stream_curated"](spark, sf).collect()
    )
    # Restaged from scratch: both batches present and equal to the
    # direct (non-streaming) twin that shares the oracle by design.
    assert {b for _, b in got} == {0, 1}
    direct = sorted(
        (r.doc_id, r.batch) for r in qs["curate_incr"](spark, sf).collect()
    )
    assert got == direct
    assert os.path.exists(os.path.join(root, "_DRAINED"))
    assert sorted(os.listdir(os.path.join(root, "src"))) == [
        "batch0.parquet",
        "batch1.parquet",
    ]
    assert not os.path.exists(os.path.join(root, "_stage"))
