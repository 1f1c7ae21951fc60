"""Cluster-size independence: the sharding/packing/sampling assignments
claim to be pure functions of the data (reproducible on any executor
count). Pin it by running the same query under different shuffle-partition
settings — the results must be identical rows, not just close."""

from __future__ import annotations

from incr_iter_hadoop_spark.registry import all_queries

QUERIES = ["shard_manifest", "pack_sequences", "sample_token_budget"]


def _rows(spark, sf_dir, name):
    return sorted(
        tuple(r) for r in all_queries()[name].fn(spark, sf_dir).collect()
    )


def test_assignments_invariant_to_shuffle_partitioning(spark, sf_dir):
    conf = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "3")
        low = {n: _rows(spark, sf_dir, n) for n in QUERIES}
        spark.conf.set(conf, "17")
        high = {n: _rows(spark, sf_dir, n) for n in QUERIES}
    finally:
        spark.conf.set(conf, orig)
    for n in QUERIES:
        assert low[n] == high[n], f"{n}: partitioning changed the result"
