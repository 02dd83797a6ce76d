"""Uploader daemon: EXPORTED -> UPLOADED with integrity + cleanup.

Pins ``bigquery/chunk_uploader.py:127-310`` semantics: manifest
validation before upload, manifest-last ordering, post-upload
verification, ledger flip to UPLOADED with the destination uri, staging
trigger, and recursive destination cleanup on failure.
"""

from __future__ import annotations

import json
import os

import pytest

from dax_ppdb_spark.ledger import Ledger
from dax_ppdb_spark.pipeline.promote import Promoter
from dax_ppdb_spark.pipeline.store import store_chunk
from dax_ppdb_spark.pipeline.upload import ChunkUploader, ChunkUploadError
from dax_ppdb_spark.schema.registry import ChunkStatus


def _export(spark, root, ledger, chunk_id, n=3):
    df = spark.createDataFrame(
        [(i + chunk_id * 100, 100.0, None, 45.0, -30.0, 1) for i in range(n)],
        "diaObjectId LONG, validityStartMjdTai DOUBLE, validityEndMjdTai DOUBLE, "
        "ra DOUBLE, dec DOUBLE, nDiaSources INT",
    )
    return store_chunk(spark, root, chunk_id, {"DiaObject": df}, ledger=ledger)


def test_upload_flow_and_ledger(spark, tmp_path):
    export, bucket = str(tmp_path / "export"), str(tmp_path / "bucket")
    ledger = Ledger(spark, str(tmp_path / "ledger"))
    _export(spark, export, ledger, 1)
    _export(spark, export, ledger, 2)
    staged = []
    up = ChunkUploader(ledger, export, bucket, stage_trigger=lambda d, c: staged.append(c))
    assert up.pending() == [1, 2]
    assert up.run_once() == [1, 2]
    assert staged == [1, 2]
    rows = {r.apdb_replica_chunk: r for r in ledger.read().collect()}
    assert rows[1].status == ChunkStatus.UPLOADED.value
    assert rows[1].gcs_uri == os.path.join(bucket, "chunk_1")
    assert os.path.exists(os.path.join(bucket, "chunk_1", "manifest.json"))
    # second poll: nothing EXPORTED remains
    assert up.run_once() == []


def test_corrupt_manifest_blocks_upload(spark, tmp_path):
    export, bucket = str(tmp_path / "export"), str(tmp_path / "bucket")
    ledger = Ledger(spark, str(tmp_path / "ledger"))
    chunk_dir = _export(spark, export, ledger, 1)
    # corrupt a data file after the manifest was written
    for root, _d, names in os.walk(chunk_dir):
        for n in names:
            if n.endswith(".parquet"):
                with open(os.path.join(root, n), "ab") as f:
                    f.write(b"junk")
    up = ChunkUploader(ledger, export, bucket, exit_on_error=True)
    with pytest.raises(ChunkUploadError, match="manifest invalid"):
        up.run_once()
    assert not os.path.exists(os.path.join(bucket, "chunk_1"))
    row = ledger.read().collect()[0]
    assert row.status == ChunkStatus.EXPORTED.value  # untouched, retryable


def test_failed_stage_trigger_cleans_destination(spark, tmp_path):
    export, bucket = str(tmp_path / "export"), str(tmp_path / "bucket")
    ledger = Ledger(spark, str(tmp_path / "ledger"))
    _export(spark, export, ledger, 1)

    def boom(dest, chunk_id):
        raise RuntimeError("staging down")

    up = ChunkUploader(ledger, export, bucket, stage_trigger=boom)
    assert up.run_once() == []  # swallowed without exit_on_error
    assert not os.path.exists(os.path.join(bucket, "chunk_1"))


def test_unsafe_manifest_name_rejected(spark, tmp_path):
    export, bucket = str(tmp_path / "export"), str(tmp_path / "bucket")
    ledger = Ledger(spark, str(tmp_path / "ledger"))
    chunk_dir = _export(spark, export, ledger, 1)
    mpath = os.path.join(chunk_dir, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["files"][0]["name"] = "../escape.parquet"
    with open(mpath, "w") as f:
        json.dump(m, f)
    up = ChunkUploader(ledger, export, bucket, exit_on_error=True)
    with pytest.raises(ChunkUploadError, match="unsafe|invalid"):
        up.upload_chunk(1)


def test_full_lifecycle_export_upload_stage_promote(spark, tmp_path):
    """The three daemons chained: replicate-export -> upload -> stage ->
    promote, driven only by ledger states."""
    root = str(tmp_path)
    promoter = Promoter(spark, root)
    ledger = promoter.ledger
    _export(spark, root + "/export", ledger, 1)
    up = ChunkUploader(
        ledger,
        root + "/export",
        root + "/bucket",
        stage_trigger=promoter.stage_chunk_dir,
    )
    assert up.run_once() == [1]
    assert ledger.promotable_chunks() == [1]
    assert promoter.promote() == [1]
    statuses = {r.apdb_replica_chunk: r.status for r in ledger.read().collect()}
    assert statuses == {1: ChunkStatus.PROMOTED.value}
    pub = promoter.public_diaobject.read(spark)
    assert pub.count() == 3
