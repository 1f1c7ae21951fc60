"""UDF / UDAF / UDTF surface (SURVEY §2.10, U1-U5).

The reference's entire app layer is "UDFs" — user Mapper/Reducer classes
(incr-hadoop-0.1/src/mapred/org/apache/hadoop/mapred/Mapper.java:1-160) and
the pluggable ValueAggregator registry (lib/aggregate/
ValueAggregatorDescriptor.java:1-80). Spark-first equivalents, all
Arrow-batched (never row-at-a-time Python):

- U1 scalar map        → ``@pandas_udf`` scalar
- U3 pluggable UDAF    → ``pandas_udf`` GROUPED_AGG / ``applyInPandas``
- U1 flatMap/UDTF      → builtin ``explode`` of an array-returning expression
- U4 external-program  → ``mapInPandas`` (see sources.readers pipe)
- U5 chained map/reduce→ ordinary DataFrame chaining (every query here)

Scale note: the hot paths stay JVM-side wherever a builtin exists; these
queries demonstrate the escape hatch with Arrow batching, which is the only
acceptable Python boundary at 100 TB (10-100× over row UDFs).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from ..functions.text import ws_tokens
from ..registry import register


# NOTE: pandas_udf() must be called lazily (inside the query fns) — the
# decorator resolves the return type against the ACTIVE SparkSession, and the
# registry imports this module before any session exists.


def _margin_score_udf():
    @pandas_udf("double")
    def _margin_score(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        """Scalar pandas UDF (U1): vectorized over Arrow batches."""
        return price * (1.0 - discount) * (1.0 + tax)

    return _margin_score


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
    doc="U1 scalar pandas_udf (Arrow-vectorized) — the sanctioned Python "
    "escape hatch; equivalent builtin expression shown in the oracle.",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    margin = _margin_score_udf()
    return li.where(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            margin(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")), 6
        ).alias("charge"),
    )


def _weighted_avg_udf():
    @pandas_udf("double")
    def _weighted_avg(value: pd.Series, weight: pd.Series) -> float:
        """GROUPED_AGG pandas UDF (U3): one scalar per group, partial-free
        (Spark ships whole groups through Arrow)."""
        w = weight.sum()
        return float((value * weight).sum() / w) if w else 0.0

    return _weighted_avg


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_discount * l_quantity) / SUM(l_quantity), 6)
             AS wavg_discount
    FROM lineitem GROUP BY 1
    """,
    doc="U3 UDAF via pandas_udf GROUPED_AGG: quantity-weighted mean discount "
    "(ValueAggregator plug-in analogue, lib/aggregate/).",
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wavg = _weighted_avg_udf()
    return li.groupBy("l_returnflag").agg(
        F.round(wavg(F.col("l_discount"), F.col("l_quantity")), 6).alias(
            "wavg_discount"
        )
    )


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas per-group transform (U3 full-group UDAF shape): z-score
    of order totals within each priority class."""
    mu = pdf["o_totalprice"].mean()
    sd = pdf["o_totalprice"].std(ddof=1)
    out = pdf[["o_orderkey", "o_orderpriority"]].copy()
    if pd.notna(sd) and sd > 0:
        out["z"] = ((pdf["o_totalprice"] - mu) / sd).round(6)
    else:
        # single-row group: std(ddof=1) is NaN (truthy!); sd == 0 divides by
        # zero. SQL stddev_samp/division yields NULL in both cases — emit
        # None, not 0.0, to match the oracle.
        out["z"] = None
    return out


@register(
    "udf_apply_in_pandas",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND((o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_orderpriority))
                 / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderpriority),
                 6) AS z
    FROM orders
    """,
    doc="U3 applyInPandas: whole-group pandas transform (per-priority "
    "z-score); oracle is the window-function equivalent.",
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").applyInPandas(
        _zscore_group, "o_orderkey bigint, o_orderpriority string, z double"
    )


@register(
    "udtf_explode_bigrams",
    oracle="""
    WITH t AS (
      SELECT list_filter(string_split(trim(p_name), ' '), x -> x <> '') AS w
      FROM part
    )
    SELECT bg AS bigram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg
      FROM t WHERE len(w) >= 2
    ) GROUP BY bg
    """,
    doc="U1 UDTF shape: array-returning expression + explode (flatMap "
    "equivalent) — bigram counts over part names, fully JVM-side.",
)
def udtf_explode_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    toks = ws_tokens(F.col("p_name"))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("w", i + 1), F.element_at("w", i + 2)
        ),
    )
    return (
        p.select(toks.alias("w"))
        .where(F.size("w") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cogroup_balance(key, orders_pdf, cust_pdf):
    import pandas as pd

    n = len(orders_pdf)
    spend = float(orders_pdf["o_totalprice"].sum()) if n else 0.0
    acct = float(cust_pdf["c_acctbal"].iloc[0]) if len(cust_pdf) else None
    # raw values only: rounding happens in the Spark plan via F.round
    # (half-away-from-zero, the repo/oracle convention) — Python's round()
    # is banker's rounding and diverges on .5 ties at the 6th decimal
    return pd.DataFrame(
        {
            "c_custkey": [int(key[0])],
            "n_orders": [n],
            "spend": [spend],
            "acctbal": [acct],
        }
    )


@register(
    "udf_cogrouped_stats",
    oracle="""
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 6) AS spend,
           ROUND(c.c_acctbal, 6) AS acctbal
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_acctbal
    """,
    doc="U3's COGROUP variant (applyInPandas over groupBy().cogroup()): "
    "orders and customer are co-partitioned on the customer key and each "
    "key's two Arrow batches land in one Python function — the "
    "reduce-side multi-input contract (J4's tagged-join mechanics) "
    "exposed as a user hook. Customers with no orders still emit (the "
    "cogroup sees an empty left frame), pinned by the oracle's LEFT "
    "JOIN. Float sums rounded on both sides.",
)
def udf_cogrouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    out = (
        o.groupBy("c_custkey")
        .cogroup(c.groupBy("c_custkey"))
        .applyInPandas(
            _cogroup_balance,
            "c_custkey bigint, n_orders bigint, spend double, acctbal double",
        )
        .withColumn("spend", F.round("spend", 6))
        .withColumn("acctbal", F.round("acctbal", 6))
    )
    # cogroup emits one row per key present in EITHER side; customers are
    # the contract (oracle's LEFT JOIN base) — keys with orders but no
    # customer row would have NULL acctbal AND no customer: none exist in
    # the fixture universe, but the semi-join pins the contract anyway
    return out.join(c.select("c_custkey"), "c_custkey", "left_semi")
