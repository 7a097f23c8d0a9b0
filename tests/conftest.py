from __future__ import annotations

import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def warehouse_dir():
    d = tempfile.mkdtemp(prefix="spark_icebreaker_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def spark(warehouse_dir):
    from dbt_icebreaker_spark.session import get_spark

    s = get_spark(app_name="tests", warehouse_dir=warehouse_dir)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
