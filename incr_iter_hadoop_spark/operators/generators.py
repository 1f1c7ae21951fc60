"""Synthetic data generators (SURVEY §2.2 P8-P9).

The reference ships RandomWriter/RandomTextWriter (examples/RandomWriter.
java:1-280) and the graph/point generators genGraph/genGraphReduce
(utils/genGraphReduce.java:35-230, lognormal out-degree types sp/pg/km/nmf/
power). Spark-first: ``spark.range`` + pure-arithmetic pseudo-randomness —
a 31-bit LCG on the row id — so the output is deterministic, identical in
DuckDB (oracle-checkable, unlike rand()), and embarrassingly parallel: range
splits across executors with no coordination, the 100 TB generator pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

_N = 10_000
# Lehmer/LCG constants (numerical recipes); all math stays in BIGINT range
_A, _C, _M = 1103515245, 12345, 2**31


def _lcg(col):
    return (col * _A + _C) % _M


@register(
    "gen_random_kv",
    oracle=f"""
    SELECT id AS k,
           ((id * {_A} + {_C}) % {_M}) % 1000 AS v
    FROM range({_N}) t(id)
    """,
    doc="P8 RandomWriter analogue: deterministic LCG keyed by row id — "
    "spark.range parallel generation, oracle-identical arithmetic.",
)
def gen_random_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(_N).select(
        F.col("id").alias("k"), (_lcg(F.col("id")) % 1000).alias("v")
    )


@register(
    "gen_graph_degrees",
    oracle=f"""
    WITH nodes AS (
      SELECT id,
             1 + CAST(floor(pow(((id * {_A} + {_C}) % {_M}) / {_M}.0, 4) * 50)
                      AS BIGINT) AS deg
      FROM range({_N}) t(id)
    )
    SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM nodes GROUP BY deg
    """,
    doc="P9 genGraphReduce analogue (utils/genGraphReduce.java:175-230): "
    "heavy-tailed out-degree per node via u⁴ power transform of the LCG "
    "uniform (deterministic stand-in for the lognormal sampler); degree "
    "histogram out.",
)
def gen_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _lcg(F.col("id")) / float(_M)
    deg = (F.floor(F.pow(u, 4) * 50) + 1).cast("bigint")
    return (
        spark.range(_N)
        .select(deg.alias("deg"))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def gen_graph_edges(spark: SparkSession, n_nodes: int, avg_degree: int = 8) -> DataFrame:
    """Materialized edge generator (the actual genGraph fixture path):
    each node gets LCG-derived out-degree, destinations LCG-hashed —
    fully parallel, no shuffle until the consumer asks for one."""
    deg = (F.floor(F.pow(_lcg(F.col("id")) / float(_M), 4) * 2 * avg_degree) + 1)
    nodes = spark.range(n_nodes).select(F.col("id").alias("src"), deg.alias("deg"))
    exploded = nodes.select(
        "src", F.explode(F.sequence(F.lit(1), F.col("deg"))).alias("e")
    )
    dst = _lcg(F.col("src") * 31 + F.col("e")) % n_nodes
    return exploded.select("src", dst.alias("dst"))
