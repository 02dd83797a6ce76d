from __future__ import annotations

import os

import pytest

from dax_ppdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Small core count + few shuffle partitions: unit tests are tiny and
    # dominated by scheduling overhead, not data volume.
    # Each pytest run gets its own warehouse dir: saveAsTable catalogs
    # are per-session (in-memory) but their DATA directories are not —
    # two concurrent runs sharing a warehouse clobber each other's
    # same-named tables.
    import shutil
    import tempfile

    created = None
    if "SPARK_GRAFT_WAREHOUSE" not in os.environ:
        created = tempfile.mkdtemp(prefix="dax_ppdb_wh_test_")
        os.environ["SPARK_GRAFT_WAREHOUSE"] = created
    s = get_spark("dax_ppdb_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    if created is not None:
        shutil.rmtree(created, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
