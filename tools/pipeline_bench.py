"""End-to-end replication pipeline benchmark (daemons, not queries).

Synthesizes N replica chunks of DiaObject/DiaSource rows with
retroactive updates, then drives the full lifecycle — store (export +
manifest) -> upload (verify + copy) -> stage -> promote (7 steps) —
and reports wall-clock per phase and total rows/s.  This measures what
the query bench can't: manifest hashing, atomic swaps, partition
drops, ledger transitions, the update MERGE chain.

Usage: python tools/pipeline_bench.py [n_chunks] [objects_per_chunk]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dax_ppdb_spark.session import get_spark  # noqa: E402
from dax_ppdb_spark.pipeline.promote import Promoter  # noqa: E402
from dax_ppdb_spark.pipeline.store import store_chunk  # noqa: E402
from dax_ppdb_spark.pipeline.upload import ChunkUploader  # noqa: E402


def synth_chunk(spark, chunk_id: int, n_obj: int):
    """One chunk: n_obj DiaObjects (10% new versions of prior objects),
    2 sources per object, and withdraw-updates for 1% of sources."""
    base = spark.range(n_obj).select(
        (F.col("id") + (chunk_id % 3) * (n_obj // 2)).alias("diaObjectId"),
        (F.lit(60000.0) + chunk_id + F.col("id") % 7 / 10.0).alias(
            "validityStartMjdTai"
        ),
        F.lit(None).cast("double").alias("validityEndMjdTai"),
        (F.col("id") % 3600 / 10.0).alias("ra"),
        (F.col("id") % 1700 / 10.0 - 85.0).alias("dec"),
        F.lit(1).alias("nDiaSources"),
    )
    sources = spark.range(2 * n_obj).select(
        (F.lit(chunk_id) * 10_000_000 + F.col("id")).alias("diaSourceId"),
        (F.col("id") % n_obj + (chunk_id % 3) * (n_obj // 2)).alias("diaObjectId"),
        F.lit(None).cast("long").alias("ssObjectId"),
        (F.col("id") % 3600 / 10.0).alias("ra"),
        (F.col("id") % 1700 / 10.0 - 85.0).alias("dec"),
        (F.lit(60000.0) + chunk_id).alias("midpointMjdTai"),
        F.lit(None).cast("double").alias("ssObjectReassocTimeMjdTai"),
        F.lit(None).cast("double").alias("timeWithdrawnMjdTai"),
    )
    updates = spark.range(max(1, 2 * n_obj // 100)).select(
        (F.lit(1_000_000_000).cast("long") * chunk_id + F.col("id")).alias("update_time_ns"),
        F.col("id").alias("update_order"),
        F.lit("withdraw_diasource").alias("update_type"),
        F.to_json(
            F.struct(
                (F.lit(chunk_id) * 10_000_000 + F.col("id") * 50).alias("diaSourceId"),
                (F.lit(60001.0) + chunk_id).alias("timeWithdrawnMjdTai"),
            )
        ).alias("json_payload"),
    )
    return {"DiaObject": base, "DiaSource": sources}, updates


def _promote_one(spark, promoter, ledger, root, chunk_id: int, n_obj: int) -> dict:
    """Store + stage + promote one chunk; return per-step promote seconds."""
    from dax_ppdb_spark import metrics

    tables, updates = synth_chunk(spark, chunk_id, n_obj)
    c_dir = store_chunk(
        spark, root + "/export", chunk_id, tables, updates=updates, ledger=ledger
    )
    promoter.stage_chunk_dir(c_dir, chunk_id)
    metrics.clear()
    t0 = time.time()
    assert promoter.promote() == [chunk_id]
    total = time.time() - t0
    steps = {
        r["stage"]: round(r["seconds"], 2) for r in metrics.recent(kind="timer")
    }
    steps["total"] = round(total, 2)
    return steps


def scale_axis(factor: int, n_obj: int) -> None:
    """Promote cost vs internal-table size: promote a same-size batch
    against a small internal table and against one ``factor``x bigger.

    With range-bucketed internal tables every step is O(batch): the
    per-step timings must stay flat as internal grows (the public
    snapshot too — it is maintained incrementally).  This is the axis
    the query bench can't see: a full-rewrite promotion would show
    promote time scaling with ``factor``.
    """
    from dax_ppdb_spark.ops.spatial import with_geo_point
    from dax_ppdb_spark.pipeline.promote import OBJ_BUCKET, DIA_TABLES

    spark = get_spark("pipeline-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="pipeline_bench_scale_")
    try:
        promoter = Promoter(spark, root)
        ledger = promoter.ledger
        # Seed internal, then measure a batch against the small table.
        _promote_one(spark, promoter, ledger, root, 1, n_obj)
        steps_small = _promote_one(spark, promoter, ledger, root, 2, n_obj)
        small_rows = promoter.internal["DiaObject"].read(spark).count()

        # Grow internal by factor: synthetic history in far-away id
        # ranges (promoted long ago, untouched by the next batch).
        big = spark.range(factor * n_obj).select(
            (F.lit(1_000_000_000) + F.col("id")).alias("diaObjectId"),
            (F.lit(59000.0) + F.col("id") % 997 / 100.0).alias("validityStartMjdTai"),
            F.lit(None).cast("double").alias("validityEndMjdTai"),
            (F.col("id") % 3600 / 10.0).alias("ra"),
            (F.col("id") % 1700 / 10.0 - 85.0).alias("dec"),
            F.lit(1).alias("nDiaSources"),
        )
        grown = promoter._with_bucket(with_geo_point(big), "DiaObject")
        promoter.internal["DiaObject"].append(grown, partition_by=(OBJ_BUCKET,))
        big_rows = promoter.internal["DiaObject"].read(spark).count()

        steps_big = _promote_one(spark, promoter, ledger, root, 3, n_obj)
        print(json.dumps({
            "metric": "promote_scale_axis_ratio",
            "value": round(steps_big["total"] / max(steps_small["total"], 1e-9), 2),
            "unit": "x (promote time big/small; flat == ~1)",
            "internal_rows_small": small_rows,
            "internal_rows_big": big_rows,
            "growth_factor": factor,
            "promote_steps_sec_small": steps_small,
            "promote_steps_sec_big": steps_big,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-axis":
        factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100
        n_obj = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
        scale_axis(factor, n_obj)
        return
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_obj = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="pipeline_bench_")
    phases: dict[str, float] = {}
    total_rows = n_chunks * (3 * n_obj + max(1, 2 * n_obj // 100))
    try:
        promoter = Promoter(spark, root)
        ledger = promoter.ledger

        t0 = time.time()
        for cid in range(1, n_chunks + 1):
            tables, updates = synth_chunk(spark, cid, n_obj)
            store_chunk(spark, root + "/export", cid, tables, updates=updates, ledger=ledger)
        phases["store"] = time.time() - t0

        t0 = time.time()
        uploader = ChunkUploader(
            ledger, root + "/export", root + "/bucket",
            stage_trigger=promoter.stage_chunk_dir, exit_on_error=True,
        )
        done = uploader.run_once()
        phases["upload_stage"] = time.time() - t0
        assert done == list(range(1, n_chunks + 1)), done

        t0 = time.time()
        promoted = promoter.promote()
        phases["promote"] = time.time() - t0
        assert promoted == done

        n_pub = promoter.public_diaobject.read(spark).count()
        total = sum(phases.values())
        print(json.dumps({
            "metric": "pipeline_rows_per_sec",
            "value": round(total_rows / total, 1),
            "unit": "rows/s",
            "phases_sec": {k: round(v, 2) for k, v in phases.items()},
            "total_sec": round(total, 2),
            "rows_in": total_rows,
            "public_rows": n_pub,
            "chunks": n_chunks,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
