"""Window / ranking / sort / top-k operators (SURVEY §2.5-2.6) + event-time
windows on the batch path (§2.9 declared surface).

Reference parity:
- W1 secondary sort → examples/SecondarySort.java:1-230 (FirstPartitioner
  :60-75, grouping comparator :77-100): partition by first key, values sorted
  by second → ``Window.partitionBy(first).orderBy(second)``.
- O1 total-order sort → examples/Sort.java + lib/TotalOrderPartitioner.java:
  1-260 (sampled range partitioning) — Spark ``orderBy`` range-partitions by
  sampling internally, the exact same design.
- O4 top-k → examples/Grep.java:47-88 second job (sort desc + head).
- Event-time tumbling/sliding/session windows are absent in the reference
  (no stream processing); declared Spark surface over the events table.
  The same functions run in Structured Streaming (see streaming/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.stable import dsum, dsum_sql
from ..registry import register


@register(
    "secondary_sort_top3",
    oracle="""
    SELECT * FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(l_shipdate AS DATE)::VARCHAR AS ship,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS BIGINT) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
    doc="W1 secondary sort (SecondarySort.java:1-230): partition by first key,"
    " order by second; top-3 per group keeps output bounded.",
)
def secondary_sort_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").cast("string").alias("ship"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_battery",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
                AS BIGINT) AS price_rank,
           ROUND(LAG(o_totalprice) OVER w, 6) AS prev_price,
           ROUND(LEAD(o_totalprice) OVER w, 6) AS next_price,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="declared window battery: row_number/rank/lag/lead/running sum "
    "(absent in reference, §2.5).",
)
def window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrank = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(wrank).cast("bigint").alias("price_rank"),
        F.round(F.lag("o_totalprice").over(w), 6).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 6).alias("next_price"),
        F.round(F.sum("o_totalprice").over(wsum), 6).alias("run_sum"),
    )


@register(
    "total_sort_top100",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey, ROUND(o_totalprice, 6) AS price,
             CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                  AS BIGINT) AS pos
      FROM orders
    ) WHERE pos <= 100
    """,
    doc="O1/O2 total-order sort + O4 top-k: orderBy triggers Spark's sampled "
    "range partitioner (TotalOrderPartitioner.java:1-260 equivalent); "
    "row_number materializes the order for the order-insensitive checker.",
)
def total_sort_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # distributed TakeOrdered first — a global row_number window would drag
    # the whole table through one partition at scale; after limit(100) the
    # window ranks 100 rows
    top = o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.select(
        "o_orderkey",
        F.round("o_totalprice", 6).alias("price"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "topk_customers",
    oracle=f"""
    SELECT * FROM (
      SELECT o_custkey, {dsum_sql('o_totalprice')} AS spend,
             CAST(ROW_NUMBER() OVER (
               ORDER BY SUM(CAST(o_totalprice AS DECIMAL(27,6))) DESC, o_custkey)
                  AS BIGINT) AS pos
      FROM orders GROUP BY o_custkey
    ) WHERE pos <= 10
    """,
    doc="O4 top-k after aggregation (Grep.java:47-88 second-job shape).",
)
def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("raw_spend")
    )
    # TakeOrdered before the window — see total_sort_top100
    top = agg.orderBy(F.desc("raw_spend"), F.asc("o_custkey")).limit(10)
    w = Window.orderBy(F.desc("raw_spend"), F.asc("o_custkey"))
    return top.select(
        "o_custkey",
        F.round(F.col("raw_spend").cast("double"), 6).alias("spend"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "sort_validate",
    oracle="""
    WITH seq AS (
      SELECT o_totalprice,
             LAG(o_totalprice) OVER (ORDER BY o_orderkey) AS prev_price
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN prev_price IS NOT NULL AND prev_price > o_totalprice
                         THEN 1 ELSE 0 END) AS BIGINT) AS inversions
    FROM seq
    """,
    doc="O2 TeraValidate analogue: lag-based order check over the key-ordered "
    "stream (TeraValidate.java verifies sortedness the same way); counts "
    "price inversions in orderkey order.",
)
def sort_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed validation, TeraValidate's actual design: range-partition
    by the sort key, count inversions within each sorted partition in one
    pass (mapInPandas), and fix up the partition boundaries from the tiny
    per-partition (first, last) summary — no single-partition global window.
    """
    import pandas as pd
    from collections.abc import Iterator

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n_parts = max(2, int(spark.conf.get("spark.sql.shuffle.partitions")) // 4)
    ranged = o.repartitionByRange(n_parts, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    )

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows, inv = 0, 0
        first_key = first_price = last_key = last_price = None
        prev_price = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows += len(pdf)
            prices = pdf["o_totalprice"].to_numpy()
            if prev_price is not None and prev_price > prices[0]:
                inv += 1
            inv += int((prices[:-1] > prices[1:]).sum())
            if first_key is None:
                first_key = int(pdf["o_orderkey"].iloc[0])
                first_price = float(prices[0])
            last_key = int(pdf["o_orderkey"].iloc[-1])
            prev_price = last_price = float(prices[-1])
        if rows:
            yield pd.DataFrame(
                {
                    "rows": [rows],
                    "inv": [inv],
                    "first_key": [first_key],
                    "first_price": [first_price],
                    "last_key": [last_key],
                    "last_price": [last_price],
                }
            )

    parts = ranged.mapInPandas(
        per_partition,
        "rows long, inv long, first_key long, first_price double, "
        "last_key long, last_price double",
    ).collect()
    parts.sort(key=lambda r: r["first_key"])
    total_rows = sum(r["rows"] for r in parts)
    inversions = sum(r["inv"] for r in parts)
    for a, b in zip(parts, parts[1:]):
        if a["last_price"] > b["first_price"]:
            inversions += 1
    return spark.createDataFrame(
        [(total_rows, inversions)], "n_rows bigint, inversions bigint"
    )


# terasort-shaped skewed-key fixture (round 12, VERDICT r11 ask #5):
# row count, hot-key mass, and the fingerprint modulus of the rank checksum
_SKEW_N = 200_000
_SKEW_FP_MOD = 1_000_000_007


def _skewed_keys(spark: SparkSession, n: int = _SKEW_N) -> DataFrame:
    """TeraGen-analogue ADVERSARIAL fixture: wide (10-char, zero-padded)
    string keys whose value distribution is heavily skewed — u^6 of the
    LCG uniform puts ~10% of all rows on the single key '0000000000'
    (TeraGen.java generates uniform 10-byte keys; the stress here is the
    opposite adversary, the key distribution a sampled range partitioner
    must SPLIT to avoid a straggler partition). u^6 is written as five
    explicit multiplications — IEEE multiply is correctly rounded, so the
    skew transform is bit-identical in Spark and DuckDB (general pow is
    not correctly rounded and could flip floor at a boundary).
    ``n`` parameterizes the scale so bench/stress.py measures THIS
    fixture at 50x rather than a drift-prone copy."""
    from .generators import _A, _C, _M

    u = ((F.col("id") * _A + _C) % _M) / F.lit(float(_M))
    u6 = u * u * u * u * u * u
    k = F.floor(u6 * 1_000_000).cast("bigint")
    return spark.range(n).select(
        "id", F.lpad(k.cast("string"), 10, "0").alias("key")
    )


@register(
    "sort_skewed_validate",
    oracle=f"""
    WITH g AS (
      SELECT id,
             ((id * 1103515245 + 12345) % 2147483648) / 2147483648.0 AS u,
             ('0x' || substr(md5('fp|' || CAST(id AS VARCHAR)), 1, 8))::BIGINT
               % 1000000007 % 1000000 AS fp
      FROM range({_SKEW_N}) t(id)
    ), k AS (
      SELECT id, fp,
             lpad(CAST(CAST(floor(u*u*u*u*u*u * 1000000) AS BIGINT)
                       AS VARCHAR), 10, '0') AS key
      FROM g
    ), r AS (
      SELECT fp, ROW_NUMBER() OVER (ORDER BY key, id) AS rn FROM k
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS inversions,
           CAST(SUM(rn * fp) % {_SKEW_FP_MOD} AS BIGINT) AS order_fp
    FROM r
    """,
    doc="O1/O2 terasort under ADVERSARIAL KEY SKEW (round 12 — VERDICT "
    "r11 missing #2; TeraGen.java/TeraValidate.java analogue): sorts "
    f"{_SKEW_N} wide 10-char keys where ~10% of rows share ONE hot key, "
    "range-partitioned on the COMPOSITE (key, id) so the sampled "
    "partitioner can split the hot key across partitions by tiebreaker "
    "(range-partitioning on the key alone necessarily stragglers — the "
    "hot key's whole mass lands in one partition whatever the sampler "
    "does). Validation is TeraValidate's distributed design: one "
    "mapInPandas pass per sorted partition emits (rows, within-partition "
    "inversions, boundary keys, fingerprint partials); the driver fixes "
    "up boundaries and reconstitutes the GLOBAL rank-weighted checksum "
    "sum(rank x fp(id)) mod p from per-partition partials — "
    "decomposable because sum((off+lr)*fp) = off*sum(fp) + sum(lr*fp) — "
    "so the oracle's ROW_NUMBER recompute checks the exact global order, "
    "not just sortedness. Straggler balance under this skew is pinned in "
    "tests/test_skewed_sort.py (max partition <= 4x mean) and measured "
    "at 10x/50x scale in bench/stress.py.",
)
def sort_skewed_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from collections.abc import Iterator

    from .sampling import fingerprint_hash

    keyed = _skewed_keys(spark).select(
        "id", "key", (fingerprint_hash(F.col("id")) % 1_000_000).alias("fp")
    )
    n_parts = max(2, int(spark.conf.get("spark.sql.shuffle.partitions")) // 4)
    ranged = keyed.repartitionByRange(
        n_parts, "key", "id"
    ).sortWithinPartitions("key", "id")

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows, inv = 0, 0
        sum_fp = sum_lr_fp = 0
        first = last = None  # (key, id) boundary tuples
        prev = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf["key"].to_numpy()
            ids = pdf["id"].to_numpy()
            fps = pdf["fp"].to_numpy()
            if prev is not None and prev > (keys[0], int(ids[0])):
                inv += 1
            kt = list(zip(keys, ids))
            inv += sum(1 for a, b in zip(kt, kt[1:]) if a > b)
            lr = pd.RangeIndex(rows + 1, rows + len(pdf) + 1).to_numpy()
            sum_fp += int(fps.sum())
            sum_lr_fp += int((lr * fps).sum())
            rows += len(pdf)
            if first is None:
                first = (keys[0], int(ids[0]))
            prev = last = (keys[-1], int(ids[-1]))
        if rows:
            yield pd.DataFrame(
                {
                    "rows": [rows],
                    "inv": [inv],
                    "first_key": [first[0]],
                    "first_id": [first[1]],
                    "last_key": [last[0]],
                    "last_id": [last[1]],
                    "sum_fp": [sum_fp],
                    "sum_lr_fp": [sum_lr_fp],
                }
            )

    parts = ranged.mapInPandas(
        per_partition,
        "rows long, inv long, first_key string, first_id long, "
        "last_key string, last_id long, sum_fp long, sum_lr_fp long",
    ).collect()
    parts.sort(key=lambda r: (r["first_key"], r["first_id"]))
    total_rows = sum(r["rows"] for r in parts)
    inversions = sum(r["inv"] for r in parts)
    for a, b in zip(parts, parts[1:]):
        if (a["last_key"], a["last_id"]) > (b["first_key"], b["first_id"]):
            inversions += 1
    order_fp, offset = 0, 0
    for p in parts:
        order_fp += offset * p["sum_fp"] + p["sum_lr_fp"]
        offset += p["rows"]
    return spark.createDataFrame(
        [(total_rows, inversions, order_fp % _SKEW_FP_MOD)],
        "n_rows bigint, inversions bigint, order_fp bigint",
    )


@register(
    "events_tumbling",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('value')} AS total
    FROM events GROUP BY 1, 2
    """,
    doc="tumbling event-time window: F.window 1h — identical code runs under "
    "Structured Streaming with a watermark (streaming/).",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


@register(
    "events_sliding",
    oracle=f"""
    WITH slotted AS (
      SELECT ts, value,
             CAST(floor(epoch(ts) / 1800) AS BIGINT) AS slot
      FROM events
    ), expanded AS (
      SELECT to_timestamp((slot - s.off) * 1800) AS window_start, value
      FROM slotted CROSS JOIN (SELECT unnest([0, 1]) AS off) s
      WHERE epoch(ts) >= (slot - s.off) * 1800
        AND epoch(ts) <  (slot - s.off) * 1800 + 3600
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('value')} AS total
    FROM expanded GROUP BY 1
    """,
    doc="sliding window 1h/30min: each event lands in 2 overlapping windows.",
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total",
        )
    )


_SESSION_ORACLE = """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) > 600
               OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL
             THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, sess_id
    """


@register(
    "events_session",
    oracle=_SESSION_ORACLE,
    doc="session window, 10-minute gap: F.session_window in Spark vs "
    "gaps-and-islands SQL in the oracle. Also the streaming session demo.",
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


_STREAM_SEQ = [0]


def _events_stream(spark: SparkSession, sf_dir: str, normalize_ts: bool = True):
    """File-source stream over the events table (the file stream source
    requires a directory, so the path glob-filters to the one table file).
    ``normalize_ts`` applies the SAME ts contract as catalog.load_table —
    nanos-encoded bigint or native timestamp, both normalized to NTZ. This
    is the single copy of a correctness-sensitive invariant every streamed
    events query shares (review finding r4: five drifting copies)."""
    import os

    # batch read first: sets the nanosAsLong conf and yields the raw schema
    load_table(spark, sf_dir, "events")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if normalize_ts:
        ts_is_nanos = raw.schema["ts"].dataType.simpleString() == "bigint"
        stream = stream.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
            if ts_is_nanos
            else F.col("ts").cast("timestamp_ntz"),
        )
    return stream


def _drain_to_memory_sink(df, name: str, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow trigger) into
    a uniquely-named memory sink and return the drained table. Raises on
    timeout: a force-stopped sink would silently return a partially-filled
    table and fail the value-hash gate confusingly."""
    _STREAM_SEQ[0] += 1
    sink = f"{name}_{_STREAM_SEQ[0]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        drained = q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    if not drained:
        raise TimeoutError(f"{name}: stream did not drain within 300s")
    return df.sparkSession.table(sink)


@register(
    "events_tumbling_streamed",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('value')} AS total
    FROM events GROUP BY 1, 2
    """,
    doc="the SAME tumbling-window aggregation executed as a Structured "
    "Streaming query: file source over the events parquet, availableNow "
    "trigger (drain-and-stop), complete-mode memory sink — proving the "
    "batch and streaming paths produce hash-identical results (the "
    "incremental mode's micro-batch expression, SURVEY §2.9).",
)
def events_tumbling_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )
    return _drain_to_memory_sink(agg, "events_tumbling_streamed", "complete")


@register(
    "events_running_totals_streamed",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS key,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(CAST(value AS DOUBLE)), 6) AS total
    FROM events GROUP BY user_id
    """,
    doc="custom stateful streaming operator end-to-end (§2.9): per-user "
    "running (count, sum) carried in applyInPandasWithState executor state "
    "across micro-batches — the Spark-native replacement for the "
    "reference's task-resident substate files (ReduceTask.java:3009-3013). "
    "Drained with availableNow over the events file source; the final "
    "update-mode emission per key equals the batch aggregate, so the "
    "stateful path is hash-checked against a plain GROUP BY oracle.",
)
def events_running_totals_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental_stream import stateful_running_totals

    stream = _events_stream(spark, sf_dir, normalize_ts=False)
    totals = stateful_running_totals(stream)
    # update-mode memory sink: one row per key per batch; the LAST emission
    # per key is the final running total (single-file source -> one batch,
    # but group-max keeps this correct under any batching)
    out = _drain_to_memory_sink(totals, "events_running_totals", "update")
    return (
        out.groupBy("key")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max(F.struct("n_events", "total")).alias("_b"),
        )
        .select("key", "n_events", F.round(F.col("_b.total"), 6).alias("total"))
    )


@register(
    "events_enriched_streamed",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {dsum_sql('e.value')} AS total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="stream-static broadcast join executed as a streaming query (J2's "
    "streaming twin, MapTask.java:794-800 ONE2ALL): the events file source "
    "streams into a broadcast customer dim, aggregated by market segment in "
    "complete mode — hash-checked against the batch join oracle. The "
    "static side is re-read per micro-batch by Structured Streaming's "
    "contract, so slowly-changing dims pick up updates at any stream rate.",
)
def events_enriched_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental_stream import stream_static_enrich

    stream = _events_stream(spark, sf_dir, normalize_ts=False)
    dim = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "user_id"
    )
    enriched = stream_static_enrich(stream, dim, "user_id")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total")
    )
    return _drain_to_memory_sink(agg, "events_enriched", "complete")


@register(
    "events_funnel",
    oracle="""
    WITH signup AS (
      SELECT user_id, MIN(ts) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id, s.first_signup,
             MIN(e.ts) AS first_purchase
      FROM signup s
      LEFT JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= s.first_signup
      GROUP BY s.user_id, s.first_signup
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_signed_up,
           CAST(COUNT(first_purchase) AS BIGINT) AS n_converted,
           ROUND(CAST(COUNT(first_purchase) AS DOUBLE) / COUNT(*), 6)
             AS conversion_rate,
           ROUND(AVG(EXTRACT(epoch FROM first_purchase - first_signup)), 6)
             AS avg_secs_to_convert
    FROM conv
    """,
    doc="funnel analysis over the event stream: users whose first purchase "
    "follows their first signup — two per-user MIN aggregations and a "
    "range-predicated left join (the order-dependent event-sequence shape "
    "windows/MATCH_RECOGNIZE engines special-case, expressed as plain "
    "relational ops); reports conversion rate and mean time-to-convert.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signup = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        signup.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("first_signup")),
            "left",
        )
        .groupBy("user_id", "first_signup")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_signed_up"),
        F.count("first_purchase").alias("n_converted"),
        F.round(
            F.count("first_purchase").cast("double") / F.count(F.lit(1)), 6
        ).alias("conversion_rate"),
        F.round(
            F.avg(
                # NTZ -> LTZ under the pinned-UTC session, -> epoch seconds
                F.col("first_purchase").cast("timestamp").cast("double")
                - F.col("first_signup").cast("timestamp").cast("double")
            ),
            6,
        ).alias("avg_secs_to_convert"),
    )


@register(
    "window_battery2",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 6) AS cheapest,
           ROUND(LAST_VALUE(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6)
             AS priciest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    doc="distribution-style window battery: ntile quartiles, percent_rank, "
    "cume_dist, first/last value over the per-customer price ordering "
    "(the unbounded-following frame makes last_value the partition max).",
)
def window_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.first("o_totalprice").over(w), 6).alias("cheapest"),
        F.round(F.last("o_totalprice").over(wfull), 6).alias("priciest"),
    )


@register(
    "streaming_dedup_events",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('value')} AS total
    FROM events GROUP BY 1
    """,
    doc="streaming deduplication (§2.9 × the dedup family): the event "
    "stream is unioned with ITSELF (every event arrives twice) and "
    "dropDuplicatesWithinWatermark(event_id) must collapse the pairs — "
    "the oracle aggregates the original table, so a missed (or over-"
    "eager) dedup doubles (or drops) counts and fails the hash. The "
    "within-watermark variant is the 100 TB shape: dedup state is evicted "
    "once the watermark passes, so state is bounded by the lateness "
    "horizon instead of growing with the stream.",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # watermarks require TIMESTAMP (tz-aware); the NTZ reading stays the
    # table contract elsewhere — here ts only gates dedup-state eviction
    doubled = (
        _events_stream(spark, sf_dir)
        .unionByName(_events_stream(spark, sf_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("total")
    )
    return _drain_to_memory_sink(agg, "streaming_dedup_events", "complete")


@register(
    "events_session_streamed",
    oracle=_SESSION_ORACLE,
    doc="the session-window aggregation executed as a real Structured "
    "Streaming query (file source, availableNow drain, complete-mode "
    "memory sink): Spark's streaming state manager MERGES sessions as "
    "micro-batches arrive — the custom-stateful analogue of the "
    "incremental micro-batch mode (SURVEY §2.9) — and the result is "
    "hash-identical to the batch twin events_session and its "
    "gaps-and-islands SQL oracle.",
)
def events_session_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )
    return _drain_to_memory_sink(agg, "events_session_streamed", "complete")


@register(
    "events_resample_gaps",
    oracle="""
    WITH spans AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY user_id
    ), hours AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM spans
    ), active AS (
      SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT hours.user_id,
           CAST(COUNT(*) AS BIGINT) AS span_hours,
           CAST(SUM(CASE WHEN active.n IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS active_hours,
           CAST(SUM(CASE WHEN active.n IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS gap_hours
    FROM hours LEFT JOIN active USING (user_id, h)
    GROUP BY hours.user_id
    """,
    doc="time-series resampling with gap detection: each user's event "
    "stream is resampled onto a dense hourly grid between their first and "
    "last event (sequence + explode — generated PER USER, so the grid "
    "never materializes globally), left-joined against the actual hourly "
    "counts, and the zero-filled gaps tallied. The grid explode and both "
    "aggregations key on user_id — max-cardinality, no skew; output is "
    "one row per user.",
)
def events_resample_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    active = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    joined = hours.join(active, ["user_id", "h"], "left")
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("span_hours"),
        F.sum(F.col("n").isNotNull().cast("int"))
        .cast("bigint")
        .alias("active_hours"),
        F.sum(F.col("n").isNull().cast("int"))
        .cast("bigint")
        .alias("gap_hours"),
    )


@register(
    "events_stream_stream_join",
    oracle="""
    WITH v AS (
      SELECT user_id, ts FROM events WHERE event_type = 'view'
    ), p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ), pairs AS (
      SELECT v.user_id,
             date_diff('second', v.ts, p.ts) AS latency_s
      FROM v JOIN p
        ON p.user_id = v.user_id
       AND p.ts >= v.ts
       AND p.ts <= v.ts + INTERVAL 30 MINUTE
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(latency_s) AS BIGINT) AS total_latency_s
    FROM pairs GROUP BY user_id
    """,
    doc="STREAM-STREAM inner join (the last §2.9 shape: two unbounded "
    "sides, per-key equality + an event-time range — view→purchase "
    "attribution within 30 minutes): both sides are watermarked file "
    "streams, the time-range condition bounds each side's join state so "
    "the watermark can evict it (the property that makes the join "
    "runnable forever at scale), availableNow drains to an append-mode "
    "memory sink, and the attribution pairs are aggregated per user. "
    "Oracle = the batch self-join; hash-identical results prove the "
    "streaming pairing emitted exactly the batch semantics.",
)
def events_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # watermarks require TIMESTAMP (not NTZ). The cast shifts both sides by
    # the same session-zone offset and ts never reaches the output — only
    # differences and per-user grouping do — so the query is tz-invariant.
    stream = _events_stream(spark, sf_dir)
    views = (
        stream.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast("timestamp").alias("v_ts"),
        )
        .withWatermark("v_ts", "30 minutes")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    pairs = views.join(
        purchases,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("interval 30 minutes")),
    )
    drained = _drain_to_memory_sink(
        pairs, "events_stream_stream_join", "append"
    )
    return (
        drained.groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.col("p_ts").cast("long") - F.col("v_ts").cast("long")
            )
            .cast("bigint")
            .alias("total_latency_s"),
        )
    )
