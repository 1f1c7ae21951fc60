"""Join operators (SURVEY §2.3, J1-J7 relational subset + declared extensions).

Reference parity:
- J1 co-partitioned merge join → MapTask.java:782-817 (runIterativeMapper);
  in Spark an equi-join whose sides share a partitioner reuses the exchange.
- J2 broadcast join → MapTask.java:794-800 ONE2ALL; here ``F.broadcast``.
- J4 reduce-side tagged join → contrib/data_join DataJoinReducerBase.java:1-230.
- J5 composite inner/outer/override join → join/CompositeInputFormat.java:1-190,
  OverrideRecordReader.java:1-90; override = COALESCE(right, left) over a
  full-outer join.
- semi/anti/non-equi are absent in the reference; declared Spark surface.

Scale notes: small dims (region/nation/supplier) are broadcast explicitly —
at 100 TB the fact side never shuffles for those joins. AQE handles skew on
the big equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stable import davg, davg_sql, dsum, dsum_sql
from ..registry import register


@register(
    "join_inner",
    oracle=f"""
    SELECT c.c_mktsegment AS seg,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_sql('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    doc="J1/J4: inner equi-join orders⋈customer; customer side broadcast "
    "(small dim) so the fact table never shuffles for the join.",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    doc="J5 outer: left outer join keeps order-less customers (count 0).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc="left-semi join (declared surface; absent in reference).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    c = load_table(spark, sf_dir, "customer")
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select("c_custkey")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="left-anti join (declared surface).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select("c_custkey")


@register(
    "join_broadcast_chain",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           {dsum_sql('s.s_acctbal')} AS bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    doc="J2 ONE2ALL analog: dim chain broadcast both hops — zero fact shuffles.",
)
def join_broadcast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dsum("s_acctbal").alias("bal"))
    )


@register(
    "join_nonequi_range",
    oracle="""
    SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS late_lines
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 90 DAY
    GROUP BY 1
    """,
    doc="range/theta join (declared): equi key + range residual — Catalyst "
    "plans the equi part as the join key, range as a post-filter.",
)
def join_nonequi_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate.cast("date") > F.date_add(o.o_orderdate.cast("date"), 90)
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("late_lines"))
    )


@register(
    "join_override",
    oracle=f"""
    WITH observed AS (
      SELECT l_partkey, {davg_sql('l_extendedprice')} AS obs_price
      FROM lineitem GROUP BY 1
    )
    SELECT p.p_partkey,
           COALESCE(o.obs_price, p.p_retailprice) AS eff_price
    FROM part p FULL OUTER JOIN observed o ON p.p_partkey = o.l_partkey
    """,
    doc="J5 override join (OverrideRecordReader.java:1-90): right source "
    "overrides left per key = full outer + COALESCE(right, left).",
)
def join_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    observed = li.groupBy("l_partkey").agg(
        davg("l_extendedprice").alias("obs_price")
    )
    return p.join(observed, p.p_partkey == observed.l_partkey, "full_outer").select(
        F.col("p_partkey"),
        F.coalesce(F.col("obs_price"), F.col("p_retailprice")).alias(
            "eff_price"
        ),
    )


@register(
    "q5_multiway_join",
    oracle=f"""
    SELECT n.n_name AS nation,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) <  DATE '1998-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q5 shape: one fact shuffle on l_orderkey; every dim broadcast. "
    "Date filter pushed to the orders scan prunes before the join.",
)
def q5_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    buckets: int = 16,
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-mitigating equi-join: the fact side gets a deterministic salt
    (hash of ``salt_src`` mod ``buckets``), the dim side is replicated
    ``buckets``× with every salt value, and the join key becomes
    (key, salt) — a hot key's rows spread across ``buckets`` shuffle
    partitions instead of one straggler task. Use when a key's row count
    exceeds what one executor can hold; AQE skew-join splits post-shuffle,
    salting prevents the skewed shuffle write itself. Cost: dim is
    replicated ``buckets``× (keep it broadcast-sized or keep buckets low).
    """
    salt_col = F.pmod(
        F.hash(F.col(salt_src) if salt_src else F.monotonically_increasing_id()),
        F.lit(buckets),
    )
    fact_s = fact.withColumn("_salt", salt_col)
    dim_s = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))),
    )
    return fact_s.join(dim_s, [key, "_salt"]).drop("_salt")


@register(
    "join_skew_salted",
    oracle=f"""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('l.l_extendedprice')} AS total
    FROM (SELECT CASE WHEN l_orderkey % 3 <> 0 THEN 1
                      ELSE l_partkey END AS hot_key,
                 l_linenumber, l_extendedprice
          FROM lineitem) l
    JOIN (SELECT p_partkey AS hot_key, p_brand FROM part) p
      ON l.hot_key = p.hot_key
    GROUP BY p.p_brand
    """,
    doc="skew-salted equi-join: ~2/3 of fact rows share one synthetic hot "
    "key; the salt (hash(l_linenumber) mod 16) spreads them across 16 "
    "shuffle partitions while the dim side is replicated 16x. Result is "
    "salt-invariant, so the plain-join oracle checks correctness.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 3 != 0, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("hot_key"),
        "l_linenumber",
        "l_extendedprice",
    )
    p = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("hot_key"), "p_brand")
        # force the shuffle path the salt exists for: at bench scale part is
        # broadcast-sized and Catalyst would (rightly) skip the shuffle —
        # the salted contract targets dims too big to broadcast
        .hint("shuffle_hash")
    )
    joined = salted_join(li, p, "hot_key", buckets=16, salt_src="l_linenumber")
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_extendedprice")).alias("total"),
    )


def one2one_join(
    left: DataFrame, right: DataFrame, key: str, *, strict: bool = True
) -> DataFrame:
    """J1's strict ONE2ONE contract: every left key must match exactly one
    right key. The reference's merge join ERRORS on mismatch
    ("one2one key doesn't match!!", MapTask.java:788-791); the engine's
    default joins relax this to outer-join semantics (SURVEY §1.3), so this
    operator restores the validating behavior where data contracts demand
    it: one validation pass (count of unmatched/duplicated keys), then the
    plain co-partitioned join. ``strict=False`` skips the validation job."""
    if strict:
        # fully ALIGNED key streams, as in the reference's merge join: a key
        # missing or duplicated on EITHER side is an error — aggregate both
        # sides and flag any (count != 1) in one validation pass
        lk = left.groupBy(key).agg(F.count(F.lit(1)).alias("_nl"))
        rk = right.groupBy(key).agg(F.count(F.lit(1)).alias("_nr"))
        bad = (
            lk.join(rk, key, "full_outer")
            .where(
                F.col("_nl").isNull()
                | F.col("_nr").isNull()
                | (F.col("_nl") != 1)
                | (F.col("_nr") != 1)
                | F.col(key).isNull()
            )
            .count()
        )
        if bad:
            raise ValueError(
                f"one2one key doesn't match: {bad} key(s) unmatched or "
                f"duplicated on '{key}'"
            )
    return left.join(right, key)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with the
    greatest ``right_ts`` <= ``left_ts`` (strictly < when ``strict``) within
    the same ``on`` key group — the time-series point-in-time lookup Spark
    has no built-in operator for.

    Scale shape: ONE shuffle (union both sides, repartition by ``on`` inside
    a window) instead of a non-equi range join — a naive
    ``l.ts >= r.ts`` theta-join degenerates to a per-key cross product,
    O(|L|·|R|) per key; here each key group is sorted once and swept
    linearly, O((|L|+|R|) log) per key. Hot keys skew the window partition —
    mitigate upstream by splitting the time range per key if needed.

    The right side must be unique per (``on``, ``right_ts``): pre-aggregate
    otherwise (ties would make the matched row nondeterministic). The whole
    matched right row travels as ONE struct through ``last(ignorenulls)`` so
    legitimately-NULL right columns can't bleed values from older rows.
    """
    from pyspark.sql import Window

    lcols = [c for c in left.columns if c not in on]
    rcols = [c for c in right.columns if c not in on]
    rstruct = F.struct(*[F.col(c) for c in rcols])
    rtype = right.select(rstruct.alias("_x")).schema[0].dataType.simpleString()
    lstruct = F.struct(*[F.col(c) for c in lcols])
    ltype = left.select(lstruct.alias("_x")).schema[0].dataType.simpleString()

    lp = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__r"),
        lstruct.alias("__l"),
        F.lit(None).cast(rtype).alias("__rp"),
    )
    rp = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__r"),
        F.lit(None).cast(ltype).alias("__l"),
        rstruct.alias("__rp"),
    )
    # ordering decides whether an equal-timestamp right row is visible to the
    # left row: backward-inclusive sorts right rows first at a tie
    tie = F.col("__r").asc() if strict else F.col("__r").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lp.unionByName(rp)
        .withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
        .where(F.col("__r") == 0)
    )
    out_cols = (
        [F.col(c) for c in on]
        + [F.col(f"__l.{c}").alias(c) for c in lcols]
        + [F.col(f"__m.{c}").alias(c) for c in rcols]
    )
    return matched.select(*out_cols)


@register(
    "join_asof",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, ts AS purchase_ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           ROUND(p.purchase_value, 6) AS purchase_value,
           ROUND(c.value, 6) AS click_value
    FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
    """,
    doc="backward as-of join (point-in-time lookup): every click is "
    "enriched with the user's most recent purchase at-or-before the click. "
    "Implemented union+sorted-window (one shuffle, linear sweep per key) — "
    "NOT a range theta-join, which would cross-product per key; oracle is "
    "DuckDB's native ASOF JOIN. Purchases pre-aggregated per (user, ts) so "
    "the match is deterministic; clicks with no prior purchase drop (inner "
    "as-of).",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join_backward(
        clicks, purchases, ["user_id"], left_ts="ts", right_ts="purchase_ts"
    )
    return joined.where(F.col("purchase_ts").isNotNull()).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round("purchase_value", 6).alias("purchase_value"),
        F.round("click_value", 6).alias("click_value"),
    )


@register(
    "er_fuzzy_name_pairs",
    oracle="""
    SELECT a.c_custkey AS a, b.c_custkey AS b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND abs(length(a.c_name) - length(b.c_name)) <= 1
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    doc="entity-resolution fuzzy match: near-identical customer names "
    "(levenshtein ≤ 1) found by BLOCKED self-join. The length block is "
    "BANDED — each record emits keys (len, len+1), so any pair with "
    "|Δlen| ≤ 1 collides on a key and insertions/deletions stay in "
    "recall (an exact-length block would silently drop every distance-1 "
    "indel pair). Pair space is Σ block² instead of N² (the standard ER "
    "blocking discipline; at 100 TB the block key grows a name-prefix "
    "component to keep blocks bounded), then each candidate is verified "
    "map-side with the exact edit distance. Oracle: the result-equivalent "
    "|Δlen| ≤ 1 join — levenshtein has identical semantics in both "
    "engines.",
)
def er_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", F.length("c_name").alias("ln")
    )
    # banded block keys: records at lengths L and L+1 share key L+1
    keys = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.explode(F.array(F.col("ln"), F.col("ln") + 1)).alias("blk"),
    )
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("a"),
            F.col("b.c_custkey").alias("b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        # equal-length pairs collide on BOTH band keys — dedupe before the
        # edit-distance verification so each pair is scored once
        .distinct()
    )
    return cand.select(
        "a",
        "b",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
    ).where(F.col("dist") <= 1)


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT NULLIF(CAST(json_extract_string(props, '$.k') AS BIGINT) % 7, 0)
               AS kn
      FROM events
    ), r AS (
      SELECT kn, COALESCE(kn, -1) * 10 AS weight
      FROM (SELECT DISTINCT kn FROM l)
    )
    SELECT l.kn, CAST(COUNT(*) AS BIGINT) AS n, r.weight
    FROM l JOIN r ON l.kn IS NOT DISTINCT FROM r.kn
    GROUP BY l.kn, r.weight
    """,
    doc="null-safe equality join (Spark `<=>` / eqNullSafe vs SQL IS NOT "
    "DISTINCT FROM): a nullable derived key joins a dimension that "
    "carries an explicit NULL member — plain equi-join semantics would "
    "silently DROP every NULL-keyed fact row (NULL = NULL is UNKNOWN); "
    "the null-safe operator keeps them matched to the NULL dimension "
    "row. Still compiles to a hash equi-join on the null-safe key, so "
    "the 100 TB shape is identical to a plain join.",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    left = e.select(
        F.nullif(
            F.get_json_object("props", "$.k").cast("bigint") % 7, F.lit(0)
        ).alias("kn")
    )
    right = left.select("kn").distinct().select(
        "kn", (F.coalesce(F.col("kn"), F.lit(-1)) * 10).alias("weight")
    )
    a = left.alias("a")
    b = right.alias("b")
    return (
        a.join(b, F.col("a.kn").eqNullSafe(F.col("b.kn")))
        .groupBy(F.col("a.kn").alias("kn"), "weight")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("kn", "n", "weight")
    )
