"""Per-stage instrumentation: the Timer / MonAgent / log_job analog.

Reference: operation timers tagged per table/chunk with row counts
(``sql/_ppdb_sql.py:197-251``, ``sql/bulk_insert.py:80-85``), per-job
bytes/slot-ms logging (``bigquery/query_runner.py:63-100``), and DML
row-count reporting (``bigquery/updates/updates_manager.py:242-271``).

Spark equivalent: wall-clock timers around driver-side stage
boundaries plus the metrics Spark itself exposes; emitted through
standard logging so deployments route them like any other telemetry.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager

_LOG = logging.getLogger("dax_ppdb_spark.metrics")


@contextmanager
def timer(stage: str, **tags):
    """Log wall-clock for a pipeline stage, tagged like the
    reference's ``Timer(..., tags={...})``."""
    t0 = time.time()
    try:
        yield
    finally:
        tag_s = " ".join(f"{k}={v}" for k, v in tags.items())
        _LOG.info("%s took %.3fs %s", stage, time.time() - t0, tag_s)


def log_rows(stage: str, n: int, **tags) -> None:
    """DML-stats logging (inserted/updated/deleted row counts)."""
    tag_s = " ".join(f"{k}={v}" for k, v in tags.items())
    _LOG.info("%s rows=%d %s", stage, n, tag_s)
