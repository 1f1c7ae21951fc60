"""Relational battery: scans, projection, filter, scalar functions (SURVEY §2.1-2.2).

Reference parity notes (cites into /root/reference/incr-hadoop-0.1/):
- S1-S4 scans  → parquet/text readers (TextInputFormat.java:1-62 etc.); here
  the canonical scan is parquet with column pruning + predicate pushdown.
- P1 projection → IdentityMapper.java:1-40 / field reorder app mappers.
- P2 regex      → lib/RegexMapper.java:1-55, examples/Grep.java:1-94.
- P3 tokenize   → examples/WordCount.java:35-44.
- P4/P5 field selection / inverse map → lib/FieldSelectionMapReduce.java:1-337,
  lib/InverseMapper.java:1-40.
- P6/P7 scalar math/string → hand-rolled codecs (IterPageRank.java:47 etc.);
  exposed here as Spark's builtin scalar battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_scan
from ..functions.stable import davg, davg_sql, dsum, dsum_sql
from ..registry import register


@register(
    "scan_pruned_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_quantity, 6) AS qty
    FROM lineitem WHERE l_quantity > 45.0
    """,
    doc="S1/S3: pruned+filtered parquet scan; filter must push to the scan.",
)
def scan_pruned_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber", F.round("l_quantity", 6).alias("qty"))
    )


@register(
    "projection_inverse_map",
    oracle="""
    SELECT c_nationkey AS k, c_custkey AS v FROM customer
    """,
    doc="P1/P5: projection + (K,V)→(V,K) inverse map (lib/InverseMapper.java:1-40).",
)
def projection_inverse_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(F.col("c_nationkey").alias("k"), F.col("c_custkey").alias("v"))


@register(
    "field_selection",
    oracle="""
    SELECT c_mktsegment AS seg,
           CAST(c_custkey AS VARCHAR) || ':' || c_name AS packed,
           ROUND(c_acctbal, 6) AS bal
    FROM customer WHERE c_acctbal > 0
    """,
    doc="P4: cut-style field selection/packing (lib/FieldSelectionMapReduce.java:1-337).",
)
def field_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.where(F.col("c_acctbal") > 0).select(
        F.col("c_mktsegment").alias("seg"),
        F.concat_ws(":", F.col("c_custkey").cast("string"), F.col("c_name")).alias(
            "packed"
        ),
        F.round("c_acctbal", 6).alias("bal"),
    )


@register(
    "grep_regex",
    oracle="""
    SELECT regexp_extract(p_name, '^(\\w+)', 1) AS word,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM part WHERE regexp_matches(p_name, '(red|blue|hot)')
    GROUP BY 1
    """,
    doc="P2: regex filter + group extract + count (examples/Grep.java:1-94, "
    "lib/RegexMapper.java:1-55).",
)
def grep_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.where(F.col("p_name").rlike("(red|blue|hot)"))
        .select(F.regexp_extract("p_name", r"^(\w+)", 1).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "wordcount",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents
    ) WHERE word <> ''
    GROUP BY word
    """,
    doc="P3/A4: tokenize + count (examples/WordCount.java:1-67). Map-side "
    "partial aggregation replaces the reference's combiner.",
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "scalar_battery",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 1, 3)) AS pri3,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
             AS days_since,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR
             AS due_date,
           ROUND(abs(o_totalprice - 1000.0), 6) AS absdiff,
           ROUND(sqrt(o_totalprice), 6) AS sq,
           ROUND(pow(o_totalprice / 100000.0, 2), 6) AS sqd
    FROM orders WHERE o_orderkey % 10 = 0
    """,
    doc="P6/P7 + declared builtin battery: string/date/math scalars stay "
    "inside whole-stage codegen (no Python in the row path).",
)
def scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("pri3"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_add(d, 30).cast("string").alias("due_date"),
        F.round(F.abs(F.col("o_totalprice") - 1000.0), 6).alias("absdiff"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sq"),
        F.round(F.pow(F.col("o_totalprice") / 100000.0, 2), 6).alias("sqd"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum
    FROM events GROUP BY event_type
    """,
    doc="Declared JSON builtin (get_json_object) over the events props column.",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_sum")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(o.o_orderdate AS DATE)::VARCHAR AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    doc="TPC-H Q3 shape: segment filter broadcast to orders, date filters "
    "pushed to both scans before the fact join.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").cast("date") < F.lit("1995-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").cast("date") > F.lit("1995-03-15").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY 1
      HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 250
    )
    SELECT c.c_custkey, o.o_orderkey,
           ROUND(o.o_totalprice, 6) AS price,
           {dsum_sql('l.l_quantity')} AS total_qty
    FROM orders o
    JOIN big     ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice
    """,
    doc="TPC-H Q18 shape: semi-join against a HAVING subquery (large "
    "orders), then re-aggregate — two passes over lineitem, one shuffle key.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("tq"))
        .where(F.col("tq") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("price"),
            "total_qty",
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o.o_orderdate AS DATE) <  DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE)
      )
    GROUP BY 1
    """,
    doc="TPC-H Q4 shape: EXISTS correlated on a non-equi condition → "
    "left-semi join, then aggregate.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-10-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate.cast("date") < o.o_orderdate.cast("date")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q17_small_quantity",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey,
             0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                    / COUNT(l_quantity)) AS half_avg
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           {dsum_sql('l.l_extendedprice')} AS total_price
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < pa.half_avg
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average) "
    "decorrelated into an aggregate + re-join; below-half-average lines.",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (davg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(pa, li.l_partkey == pa.pk)
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("total_price"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate — every predicate pushes "
    "to the parquet scan, no shuffle beyond the final 1-row agg.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return (
        li.where(
            (d >= F.lit("1995-01-01").cast("date"))
            & (d < F.lit("1996-01-01").cast("date"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) <  DATE '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape: conditional aggregation (CASE WHEN inside SUM) "
    "after an equi-join — the declared pivot/conditional-agg surface.",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p.p_name LIKE '%green%'
                    THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(27,6))
                    ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(27,6))) AS DOUBLE) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="TPC-H Q14 shape: ratio of two conditional decimal sums (exact, "
    "order-independent) over a broadcast dim join.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,6)"
    )
    promo = F.when(F.col("p_name").like("%green%"), rev).otherwise(
        F.lit(0).cast("decimal(27,6)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias(
                "promo_share"
            )
        )
    )


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
             AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship relational query (TPC-H Q1 shape): scan → filter → "
    "hash-agg with map-side partials; the whole plan is one codegen stage. "
    "Money aggregates accumulate in decimal (functions/stable.py) so the "
    "result hash is partition-order-independent.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (guide §2.5 input skew): the sf lineitem is one row group, so the
    # eight decimal partial aggregates ran on a single task; spread the
    # projected columns once after the scan (measured 1.14→0.61 s at sf0.1;
    # no-op at cluster scale where the scan is already split). Result-exact:
    # dsum/davg accumulate in decimal, order-independent.
    li = spread_scan(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate", "l_orderkey",
        ),
        "l_orderkey",
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "events_pivot",
    oracle=f"""
    SELECT user_id % 10 AS decile,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)
                AS BIGINT) AS click_n,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)
                AS BIGINT) AS error_n,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchase_n,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)
                AS BIGINT) AS signup_n,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)
                AS BIGINT) AS view_n,
           {dsum_sql("CASE WHEN event_type = 'purchase' THEN value"
                     " ELSE 0 END")} AS purchase_value
    FROM events GROUP BY 1
    """,
    doc="pivot (long→wide): per user decile, one column per event_type "
    "count plus purchase value. Explicit value list keeps it one pass "
    "(no distinct-values pre-scan); compiles to a single hash aggregate "
    "of conditional sums — no extra shuffle vs a plain groupBy.",
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.select(
            (F.col("user_id") % 10).alias("decile"), "event_type", "value"
        )
        .groupBy("decile")
        .pivot("event_type", types)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(0.0)
                .cast("decimal(27,6)")
            ).alias("pv"),
        )
    )
    return wide.select(
        "decile",
        *[
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"{t}_n")
            for t in types
        ],
        F.round(
            sum(
                F.coalesce(F.col(f"{t}_pv"), F.lit(0).cast("decimal(27,6)"))
                for t in types
            ).cast("double"),
            6,
        ).alias("purchase_value"),
    )


@register(
    "events_unpivot",
    oracle="""
    WITH wide AS (
      SELECT user_id % 10 AS decile,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS click_n,
             CAST(SUM(CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END)
                  AS BIGINT) AS view_n
      FROM events GROUP BY 1
    )
    SELECT decile, 'click_n' AS metric, click_n AS n FROM wide
    UNION ALL
    SELECT decile, 'view_n' AS metric, view_n AS n FROM wide
    """,
    doc="unpivot (wide→long): melt per-decile click/view counts back to "
    "(decile, metric, n) rows via the native UNPIVOT — a narrow-only "
    "projection per metric, no shuffle beyond the source aggregate.",
)
def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.select((F.col("user_id") % 10).alias("decile"), "event_type")
        .groupBy("decile")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("click_n"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("view_n"),
        )
    )
    return wide.unpivot(
        ids=["decile"],
        values=["click_n", "view_n"],
        variableColumnName="metric",
        valueColumnName="n",
    )


@register(
    "array_battery",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(list_min(list_transform(embedding, x -> x::DOUBLE)), 6)
             AS mn,
           ROUND(list_max(list_transform(embedding, x -> x::DOUBLE)), 6)
             AS mx,
           ROUND(list_sum(list_transform(embedding, x -> x::DOUBLE))
                 / len(embedding), 6) AS mean,
           ROUND(sqrt(list_sum(list_transform(embedding,
                                              x -> x::DOUBLE * x::DOUBLE))), 6)
             AS l2,
           CAST(len(list_filter(embedding, x -> x::DOUBLE > 0)) AS BIGINT)
             AS n_pos
    FROM embeddings
    """,
    doc="higher-order array-function battery over the embedding column: "
    "per-vector min/max/mean/L2-norm/positive-count via transform / filter "
    "/ aggregate lambdas — all JVM-side whole-stage-codegen expressions, "
    "the declared array surface (reference hand-rolls these per app over "
    "TreeMap<Integer,Double>, IterKmeans.java:295-310).",
)
def array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import norm2

    emb = spread_scan(load_table(spark, sf_dir, "embeddings"), "vec_id")
    v = F.transform("embedding", lambda x: x.cast("double"))
    total = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.array_min(v), 6).alias("mn"),
        F.round(F.array_max(v), 6).alias("mx"),
        F.round(total / F.size("embedding"), 6).alias("mean"),
        F.round(norm2(F.col("embedding")), 6).alias("l2"),
        F.size(F.filter(v, lambda x: x > 0)).cast("bigint").alias("n_pos"),
    )


@register(
    "scan_text_kv_roundtrip",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
           n_name,
           CAST(n_regionkey AS BIGINT) AS regionkey,
           CAST(LENGTH(CAST(n_nationkey AS VARCHAR)) + 1 + LENGTH(n_name)
                AS INT) AS raw_line_len
    FROM nation
    """,
    doc="S1+S2+S4 text scan surface, driver-checkable end-to-end: nation is "
    "written out as two tab-separated text files, then read back through "
    "all three reader flavors — S1 read_text_lines (raw line relation; "
    "contributes the raw line length), S2 read_kv_text (first-separator "
    "key/value split, KeyValueTextInputFormat semantics), S4 read_typed_kv "
    "(schema-cast typed KV lines, IntFloatKVInputFormat family) — joined "
    "on the key. Oracle recomputes the same rows (and the line length "
    "arithmetically) from the table directly, so any parse drift in the "
    "readers breaks the hash.",
)
def scan_text_kv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.readers import read_kv_text, read_text_lines, read_typed_kv
    from .incremental import _cleanup_at_exit

    n = load_table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="scan_text_roundtrip_")
    # the returned DataFrame reads these files lazily; clean at exit
    _cleanup_at_exit(tmp, "")
    name_file = os.path.join(tmp, "names")
    region_file = os.path.join(tmp, "regions")
    n.select(
        F.concat_ws("\t", F.col("n_nationkey"), F.col("n_name")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(name_file)
    n.select(
        F.concat_ws("\t", F.col("n_nationkey"), F.col("n_regionkey")).alias(
            "value"
        )
    ).coalesce(1).write.mode("overwrite").text(region_file)

    raw = read_text_lines(spark, name_file).select(
        F.substring_index("value", "\t", 1).cast("bigint").alias("nationkey"),
        F.length("value").cast("int").alias("raw_line_len"),
    )
    kv = read_kv_text(spark, name_file).select(
        F.col("k").cast("bigint").alias("nationkey"),
        F.col("v").alias("n_name"),
    )
    typed = read_typed_kv(
        spark, region_file, key_type="bigint", value_type="bigint"
    ).select(
        F.col("k").alias("nationkey"), F.col("v").alias("regionkey")
    )
    return (
        kv.join(typed, "nationkey")
        .join(raw, "nationkey")
        .select("nationkey", "n_name", "regionkey", "raw_line_len")
    )


@register(
    "pipe_external_transform",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
           UPPER(n_name) AS uname,
           CAST(LENGTH(n_name) AS BIGINT) AS name_len
    FROM nation
    """,
    doc="U4 external-program transport, driver-checkable: nation rows "
    "stream through an external `awk` process (Hadoop-streaming "
    "PipeMapper analogue, contrib/streaming PipeMapper.java:1-180) that "
    "upper-cases the name and appends its length; stdout lines are parsed "
    "back into typed columns on the executors via mapInPandas. Oracle "
    "computes the same transform in SQL — any transport drift (field "
    "splitting, row loss, encoding) breaks the hash.",
)
def pipe_external_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import pipe_transform

    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return pipe_transform(
        n,
        [
            "awk",
            "-F\t",
            '{ print $1 "\t" toupper($2) "\t" length($2) }',
        ],
        output_schema="nationkey bigint, uname string, name_len bigint",
    )


@register(
    "scan_multi_path_combine",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM (SELECT n_nationkey, n_name FROM nation
          UNION ALL SELECT n_nationkey, n_name FROM nation) u
    GROUP BY 1, 2
    """,
    doc="S6 multi-file combine scan, driver-checkable (the reference's "
    "CombineFileInputFormat multi-split read): nation is written to TWO "
    "separate parquet directories and both paths feed ONE "
    "spark.read.parquet(p1, p2) scan; the combined relation must hold "
    "every row exactly twice. Oracle = nation unioned with itself.",
)
def scan_multi_path_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from .incremental import _cleanup_at_exit

    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="scan_multi_path_")
    _cleanup_at_exit(tmp, "")
    p1 = os.path.join(tmp, "part_a")
    p2 = os.path.join(tmp, "part_b")
    n.write.mode("overwrite").parquet(p1)
    n.write.mode("overwrite").parquet(p2)
    both = spark.read.parquet(p1, p2)
    return both.groupBy(
        F.col("n_nationkey").cast("bigint").alias("nationkey"), "n_name"
    ).agg(F.count(F.lit(1)).alias("n_copies"))


@register(
    "scan_jsonl_roundtrip",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
    doc="JSONL round-trip, driver-checkable: the documents table is "
    "written as JSON Lines — THE interchange format of training-data "
    "pipelines — and read back with an explicit schema (schema-on-read, "
    "no inference pass at scale), proving the serialize→parse cycle is "
    "lossless including non-ASCII text (the md5 of the round-tripped "
    "text is the witness). Oracle computes the same projection from the "
    "parquet table directly, so any JSON encoding/escaping drift breaks "
    "the hash.",
)
def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from .incremental import _cleanup_at_exit

    d = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="scan_jsonl_roundtrip_")
    _cleanup_at_exit(tmp, "")
    path = os.path.join(tmp, "docs_jsonl")
    d.select("doc_id", "text", "lang", "source").write.mode(
        "overwrite"
    ).json(path)
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string"
    ).json(path)
    return back.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
    )


@register(
    "scan_jdbc_roundtrip",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
           n_name,
           CAST(n_regionkey AS BIGINT) AS regionkey
    FROM nation
    """,
    doc="S7 JDBC scan + sink, driver-checkable against a REAL database: "
    "Spark ships the embedded Derby engine, so nation is written through "
    "the partitioned JDBC sink (DBOutputFormat analogue — executors "
    "insert their partitions concurrently with batched statements) and "
    "read back through the partitioned JDBC scan (DBInputFormat "
    "analogue — partitionColumn range predicates split the table across "
    "parallel connections). Oracle recomputes from the parquet table, so "
    "any type/row drift through the SQL round-trip breaks the hash.",
)
def scan_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.readers import read_jdbc, write_jdbc
    from .incremental import _cleanup_at_exit

    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("nationkey"),
        "n_name",
        F.col("n_regionkey").cast("bigint").alias("regionkey"),
    )
    tmp = tempfile.mkdtemp(prefix="scan_jdbc_roundtrip_")
    _cleanup_at_exit(tmp, "")
    url = f"jdbc:derby:{os.path.join(tmp, 'db')};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    write_jdbc(n, url, "NATION_RT", mode="overwrite", driver=driver)
    return read_jdbc(
        spark,
        url,
        "NATION_RT",
        driver=driver,
        partitionColumn="nationkey",
        lowerBound="0",
        upperBound="25",
        numPartitions="2",
    )


@register(
    "jdbc_count_verify",
    oracle="""
    SELECT event_type || '/u' || CAST(user_id % 20 AS VARCHAR) AS page,
           CAST(COUNT(*) AS BIGINT) AS n_views
    FROM events
    GROUP BY 1
    """,
    doc="DBCountPageView analogue (round 12 — VERDICT r11 missing #3; "
    "examples/DBCountPageView.java:1-420): the reference demo counts "
    "pageviews per URL with MapReduce, writes the counts to a database "
    "table through DBOutputFormat, then VERIFIES the write by comparing "
    "the DB-side total against the source total before declaring "
    "success. Here: per-page view counts (event_type x user bucket, "
    "~100 pages) aggregate from events, land in embedded Derby through "
    "the partitioned JDBC sink, are read back through the partitioned "
    "JDBC scan, and the verify step asserts sum(read-back counts) == "
    "source row count — a silent lost-batch or double-insert raises "
    "BEFORE any result is returned (the demo's transactional contract). "
    "Output is the READ-BACK relation, so the driver hash also "
    "re-checks every per-page count against the oracle's recompute "
    "from parquet.",
)
def jdbc_count_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.readers import read_jdbc, write_jdbc
    from .incremental import _cleanup_at_exit

    e = load_table(spark, sf_dir, "events")
    counts = (
        e.select(
            F.concat(
                F.col("event_type"),
                F.lit("/u"),
                (F.col("user_id") % 20).cast("string"),
            ).alias("page")
        )
        .groupBy("page")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    tmp = tempfile.mkdtemp(prefix="jdbc_count_verify_")
    _cleanup_at_exit(tmp, "")
    url = f"jdbc:derby:{os.path.join(tmp, 'db')};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    write_jdbc(counts, url, "PAGEVIEW_COUNTS", mode="overwrite", driver=driver)
    back = read_jdbc(
        spark,
        url,
        "PAGEVIEW_COUNTS",
        driver=driver,
        # partitioned DBInputFormat-analogue scan: range predicates on the
        # count column split the read across parallel connections (rows
        # outside the bounds still arrive — the first/last partitions are
        # unbounded, so the bounds need not be tight)
        partitionColumn="n_views",
        lowerBound="0",
        upperBound="100000",
        numPartitions="2",
    ).select("page", F.col("n_views").cast("bigint").alias("n_views"))
    # the verify() step: DB total must equal the source total exactly
    # (SUM over an empty read-back is NULL -> 0, matching an empty source)
    db_total = back.agg(F.sum("n_views")).collect()[0][0] or 0
    src_total = e.count()
    if db_total != src_total:
        raise RuntimeError(
            f"jdbc_count_verify: DB total {db_total} != source total "
            f"{src_total} — the JDBC sink lost or duplicated rows"
        )
    return back


@register(
    "scan_csv_roundtrip",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, lang,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
    doc="CSV round-trip, driver-checkable: the documents table is written "
    "as CSV — commas, quotes, and non-ASCII in the text column force the "
    "writer's quoting/escaping — and read back with an explicit schema "
    "(schema-on-read; header preserved, multiLine for embedded "
    "newlines). The md5 of the round-tripped text is the witness: any "
    "quoting or escaping drift breaks the hash. Oracle computes the "
    "projection from the parquet table directly.",
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from .incremental import _cleanup_at_exit

    d = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="scan_csv_roundtrip_")
    _cleanup_at_exit(tmp, "")
    path = os.path.join(tmp, "docs_csv")
    # explicit empty/whitespace semantics (found by the adversarial docs
    # fixture): Spark's CSV writer TRIMS cell whitespace and reads empty
    # fields back as NULL by default — both silently corrupt text columns
    d.select("doc_id", "text", "lang").write.mode("overwrite").option(
        "header", True
    ).option("escape", '"').option("emptyValue", '""').option(
        "ignoreLeadingWhiteSpace", False
    ).option("ignoreTrailingWhiteSpace", False).csv(path)
    back = (
        spark.read.schema("doc_id bigint, text string, lang string")
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .option("emptyValue", "")
        # the reader's default nullValue is "" — it would turn every empty
        # text back into NULL; the fixture has no nulls, so park it on a
        # sentinel that cannot occur
        .option("nullValue", "__null__")
        .csv(path)
    )
    return back.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        "lang",
        F.length("text").cast("bigint").alias("n_chars"),
    )


@register(
    "scan_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(o_totalprice, 6) AS o_totalprice, o_orderpriority
    FROM orders
    """,
    doc="ORC round-trip, driver-checkable: the orders table is written as "
    "ORC (Spark's second columnar format — the one Hive-era warehouses "
    "hold their data in, so reading it IS a migration path from the "
    "reference's ecosystem) and read back; values must survive the "
    "encode/decode cycle exactly. Predicate pushdown and column pruning "
    "apply to ORC scans the same as parquet.",
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from .incremental import _cleanup_at_exit

    o = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="scan_orc_roundtrip_")
    _cleanup_at_exit(tmp, "")
    path = os.path.join(tmp, "orders_orc")
    o.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 6).alias("o_totalprice"),
        "o_orderpriority",
    )


@register(
    "data_quality_report",
    oracle="""
    SELECT 'orders_null_custkey' AS check_name,
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
             AS violations
    FROM orders
    UNION ALL
    SELECT 'orders_dup_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orphans',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           CAST(COUNT(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
                AS BIGINT)
    FROM lineitem
    """,
    doc="data-quality gate: the constraint-validation report every "
    "large-scale ingestion runs before data is admitted — NOT NULL, "
    "key-uniqueness, referential integrity (anti-join orphan count), "
    "domain-range checks — emitted as one (check_name, violations) "
    "relation. Shapes: the null/range checks are conditional aggregates "
    "fused into single scans; uniqueness is count-minus-distinct; the FK "
    "check is a left-anti join (fact side shuffles once, never a "
    "collect). On the clean generated fixtures every count is 0; on the "
    "adversarial fixture the orphan/empty-order edges light up — which "
    "is exactly what the check exists to catch.",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    orders_checks = o.agg(
        F.sum(F.col("o_custkey").isNull().cast("long")).alias(
            "orders_null_custkey"
        ),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "orders_dup_orderkey"
        ),
    )
    li_checks = li.agg(
        F.sum((F.col("l_extendedprice") <= 0).cast("long")).alias(
            "lineitem_nonpositive_price"
        ),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast(
                "long"
            )
        ).alias("lineitem_discount_out_of_range"),
    )
    orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("lineitem_fk_orphans"))
    )
    def melt(df):
        cols = df.columns
        return df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("check_name"),
                            F.col(c).cast("bigint").alias("violations"),
                        )
                        for c in cols
                    ]
                )
            ).alias("s")
        ).select("s.check_name", "s.violations")

    return melt(orders_checks).unionByName(melt(li_checks)).unionByName(
        melt(orphans)
    )
