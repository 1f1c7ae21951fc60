"""pin_bucketed (r14, VERDICT r13 ask #5): the bucketed scratch pin that
replaces the graph/matrix loops' setup repartition. Pins the contract the
loops rely on: HashPartitioning(key, n) with NO Exchange anywhere in the
setup subtree (scatter-write branch), clustering that lets keyed
dedup/aggregation complete within partitions, and the repartition
fallback branch above the scatter file bound."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from incr_iter_hadoop_spark.plans.loopdriver import pin_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _edges(spark, n_rows=4000, parts=6):
    return (
        spark.range(n_rows)
        .repartition(parts)
        .select(
            (F.col("id") % 97).alias("src"),
            (F.col("id") % 89).alias("dst"),
        )
    )


def test_scatter_branch_partitioning_and_zero_exchange(spark):
    df = _edges(spark)
    pinned = pin_bucketed(df, "src", 4)
    # the bucketed scan IS the partitioning: n partitions, one per bucket
    assert pinned.rdd.getNumPartitions() == 4
    # and the whole pinned subtree contains no Exchange (the scatter write
    # replaced the setup shuffle)
    assert "Exchange" not in _plan(pinned)
    # keyed aggregation completes within the bucketed layout: no Exchange
    agg_plan = _plan(pinned.groupBy("src").agg(F.count(F.lit(1))))
    assert "Exchange" not in agg_plan, agg_plan
    # subset-clustering: hash(src) co-locates (src, dst), so the loops'
    # dropDuplicates(["src", "dst"]) adds no exchange either
    dedup_plan = _plan(pinned.dropDuplicates(["src", "dst"]))
    assert "Exchange" not in dedup_plan, dedup_plan


def test_rows_round_trip_exactly(spark):
    df = _edges(spark)
    expect = sorted((r.src, r.dst) for r in df.collect())
    got = sorted((r.src, r.dst) for r in pin_bucketed(df, "src", 4).collect())
    assert got == expect


def test_fallback_branch_repartitions_above_file_bound(spark):
    df = _edges(spark, parts=8)
    # 8 input partitions x 4 buckets = 32 scatter files > bound of 16 ->
    # the write repartitions first; contract (partitioning + rows) holds
    pinned = pin_bucketed(df, "src", 4, max_scatter_files=16)
    assert pinned.rdd.getNumPartitions() == 4
    assert sorted((r.src, r.dst) for r in pinned.collect()) == sorted(
        (r.src, r.dst) for r in df.collect()
    )
    assert "Exchange" not in _plan(pinned)  # the exchange was paid at write
