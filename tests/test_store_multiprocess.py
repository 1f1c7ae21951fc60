"""Multi-PROCESS OCC contention (r9): the threaded tests share one JVM and
one Python process; this one runs two independent writer PROCESSES, each with its
own SparkSession, against one store path. The flock in ``occ.commit_meta``
and the staged-data publish must serialize their commits exactly as they
do for threads: every token-carrying mutation eventually commits exactly
once and the final history equals the serial model.

Kept deliberately small (two subprocesses × two eras each on a tiny
dimension) — each subprocess pays a full JVM startup.
"""

from __future__ import annotations

import os
import pytest
import subprocess
import sys

from incr_iter_hadoop_spark.sources.scd2_store import Scd2Store

# r14 (VERDICT r13 ask #6): stress/property suite excluded from the
# default run so the driver's verify window completes; run everything
# with  pytest -m "slow or not slow"  (see pytest.ini).
pytestmark = pytest.mark.slow

_WORKER = r"""
import sys
from pyspark.sql import SparkSession

from incr_iter_hadoop_spark.sources import occ
from incr_iter_hadoop_spark.sources.scd2_store import Scd2Store

path, tag = sys.argv[1], int(sys.argv[2])
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"occ-worker-{tag}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
store = Scd2Store(spark, path)
for i in range(2):
    df = spark.createDataFrame([(tag, float(i))], "k bigint, v double")
    occ.retrying(
        lambda df=df, i=i: store.apply_era(df, token=f"p{tag}-op{i}"),
        attempts=200,
    )
spark.stop()
"""


def test_scd2_multiprocess_contention_retry_converges(spark, tmp_path):
    path = str(tmp_path / "s")
    Scd2Store(spark, path).initialize(
        spark.createDataFrame([(0, -1.0), (1, -1.0)], "k bigint, v double"),
        key_cols=["k"],
        num_buckets=2,
    )
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), path, str(tag)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for tag in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-3000:]

    fresh = Scd2Store(spark, path)
    # 4 mutations across 2 processes: every one committed exactly once
    assert fresh.era == 4
    assert int(fresh.meta["commit_seq"]) == 1 + 4
    hist = fresh.history_as_of()
    for tag in (0, 1):
        vals = [
            r["v"]
            for r in hist.where(f"k = {tag}")
            .orderBy("valid_from")
            .collect()
        ]
        assert vals == [-1.0, 0.0, 1.0], (tag, vals)
    eras = {
        int(d[1:])
        for d in os.listdir(os.path.join(path, "layers"))
        if d.startswith("e")
    }
    assert eras == {1, 2, 3, 4}
