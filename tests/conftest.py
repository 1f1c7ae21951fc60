from __future__ import annotations

import os

import duckdb
import pytest

from incr_iter_hadoop_spark.catalog import TABLES
from incr_iter_hadoop_spark.session import get_spark

# sf0.001 keeps the suite fast while iterating; set SPARK_GRAFT_TEST_SF=sf0.01
# to run the exact driver-gate scale before committing milestones.
TEST_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "sf0.001")
SF_DIR = f"/root/testdata/{TEST_SF}"


@pytest.fixture(scope="session")
def spark():
    # r14 (VERDICT r13 ask #6): the test session defaults to local[8], not
    # local[*] — at test scale 8 cores beat 32 on every r13 driver scaling
    # ratio (task-launch overhead dominates sub-second stages; the 60-test
    # focused slice measured 192 s at local[*]=32 vs 149 s at local[8],
    # same hour). SPARK_GRAFT_CPUS still overrides for width-sensitive
    # debugging.
    master = None if "SPARK_GRAFT_CPUS" in os.environ else "local[8]"
    s = get_spark(app_name="tests", master=master, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()
