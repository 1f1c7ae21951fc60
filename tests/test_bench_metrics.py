"""The bench harness's shuffle-bytes instrumentation (r11): stage-id-keyed
sums from the app status store. Pins that the helper (a) counts a known
shuffle, (b) attributes nothing to a map-only job, and (c) never bleeds a
previous query's stages into the next measurement window."""

from __future__ import annotations

import pytest

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_shuffle_bytes_attributed_per_measurement_window(spark):
    m0 = bench._max_stage_id(spark)
    _noop(
        spark.range(200_000)
        .withColumn("k", F.col("id") % 57)
        .groupBy("k")
        .count()
    )
    shuffled = bench.shuffle_write_bytes_after(spark, m0)
    assert shuffled > 0, "a groupBy must record shuffle-write bytes"

    # a map-only job in the NEXT window contributes zero — and the
    # previous window's bytes must not bleed in
    m1 = bench._max_stage_id(spark)
    _noop(spark.range(10_000).select((F.col("id") * 2).alias("x")))
    assert bench.shuffle_write_bytes_after(spark, m1) == 0
