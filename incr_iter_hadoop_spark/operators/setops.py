"""Set operations (SURVEY §2.7 — absent in the reference beyond MultipleInputs
concatenation, lib/MultipleInputs.java:1-140; declared Spark surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def _seg_keys(spark: SparkSession, sf_dir: str, seg: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.where(F.col("c_mktsegment") == seg).select(
        F.col("c_nationkey").alias("k")
    )


@register(
    "setop_union",
    oracle="""
    SELECT k, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
    ) GROUP BY k
    """,
    doc="union all (MultipleInputs concatenation analog) + count.",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _seg_keys(spark, sf_dir, "BUILDING")
    b = _seg_keys(spark, sf_dir, "MACHINERY")
    return a.unionByName(b).groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    doc="intersect distinct.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _seg_keys(spark, sf_dir, "BUILDING")
    b = _seg_keys(spark, sf_dir, "MACHINERY")
    return a.intersect(b)


@register(
    "setop_except",
    oracle="""
    SELECT CAST(o_orderdate AS DATE)::VARCHAR AS d FROM orders
    EXCEPT
    SELECT CAST(l_shipdate AS DATE)::VARCHAR AS d FROM lineitem
    """,
    doc="except distinct: order dates on which nothing ever shipped — a "
    "non-empty difference at every scale factor (the previous "
    "nationkey-based formulation degenerated to zero rows once both "
    "segments covered all nations).",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = o.select(F.col("o_orderdate").cast("date").cast("string").alias("d"))
    b = li.select(F.col("l_shipdate").cast("date").cast("string").alias("d"))
    return a.distinct().subtract(b)
