"""Store-backed SCD2 registered queries (round-8 split out of
``operators/incremental.py`` — pure move, no behavior change: that module
had grown past 2,100 lines with nine store registrations plus shared
fixtures living alongside the refresh machinery).

These are the driver-checked queries exercising ``sources/scd2_store.py``
(the I6 preserve mechanism applied to versioned dimensions): era-layered
history reads, snapshot generations, additive schema evolution, tombstone
deletes, CDC/era streaming maintenance, and the store-backed point-in-time
join. The pure-transformation SCD2 twins (``scd2_apply``,
``scd2_customer_history``, ``scd2_point_in_time_join``) stay in
``operators/incremental.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .incremental import _cleanup_at_exit

# Shared by scd2_store_two_eras and scd2_store_snapshot_reads: both read
# history_as_of(1) and history_as_of(2) of the same two-era store, so the
# independent DuckDB rebuild is identical — the snapshot variant only
# changes WHICH on-disk generation serves the read, which is exactly the
# invariant worth pinning (a snapshot must not change any answer).
_SCD2_TWO_ERAS_ORACLE = """
    WITH v AS (
      SELECT c_custkey, ROUND(c_acctbal, 6) AS acctbal, 0 AS valid_from
      FROM customer
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 100, 6) AS acctbal, 1
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS c_custkey, ROUND(c_acctbal, 6), 1
      FROM customer WHERE c_custkey % 13 = 0
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 200, 6), 2
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS c_custkey, ROUND(c_acctbal + 500, 6), 2
      FROM customer WHERE c_custkey % 26 = 0
    ),
    h AS (
      SELECT a.as_of, v.c_custkey, v.acctbal, v.valid_from
      FROM v
      CROSS JOIN (SELECT unnest([1, 2]) AS as_of) a
      WHERE v.valid_from <= a.as_of
    )
    SELECT CAST(as_of AS BIGINT) AS as_of, c_custkey, acctbal,
           CAST(valid_from AS BIGINT) AS valid_from,
           CAST(COALESCE(
             LEAD(valid_from) OVER (
               PARTITION BY as_of, c_custkey ORDER BY valid_from),
             999999) AS BIGINT) AS valid_to,
           COALESCE(
             LEAD(valid_from) OVER (
               PARTITION BY as_of, c_custkey ORDER BY valid_from),
             999999) = 999999 AS is_current
    FROM h
    """


@register(
    "scd2_store_two_eras",
    oracle=_SCD2_TWO_ERAS_ORACLE,
    doc="I6 applied to versioned dimensions (round-6 unification): build an "
    "on-disk era-layered Scd2Store (sources/scd2_store.py) from the "
    "customer dimension, commit TWO eras of changes as append-only layers "
    "(era 1: every 7th balance +100, every 13th key spawns a new key; "
    "era 2: every 5th +200, every 26th's spawned key +500 — so keys "
    "divisible by 35 carry three versions and a layer-1 insert is itself "
    "versioned by layer 2), then TIME-TRAVEL: read history_as_of(1) AND "
    "history_as_of(2) through the store's derived-close reconstruction "
    "(base scan + layer scans + one key-window, closes never stored). "
    "The oracle independently rebuilds both eras from the generating "
    "predicates with an era-filtered union + LEAD window. Crash "
    "consistency (orphan layers invisible until the meta era bump) is "
    "pinned by tests/test_scd2_store.py.",
)
def scd2_store_two_eras(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scd2_store_eras_read(
        _customer_scd2_store(spark, sf_dir, "two_eras")
    )


def _customer_scd2_base(spark: SparkSession, sf_dir: str, tag: str):
    """Pid-unique Scd2Store initialized on the customer dimension (era 0
    only); returns (store, customer_df)."""
    import re
    import tempfile

    from ..sources.scd2_store import Scd2Store

    c = load_table(spark, sf_dir, "customer")
    slug = re.sub(
        r"[^0-9a-zA-Z]+", "_", os.path.abspath(sf_dir)
    ).strip("_").lower()
    name = f"customer_{tag}_{slug}_p{os.getpid()}"
    root = os.path.join(tempfile.gettempdir(), "spark_graft_scd2", name)
    _cleanup_at_exit(os.path.dirname(root), name)
    store = Scd2Store(spark, os.path.join(root, "store"))
    store.initialize(
        c.select("c_custkey", F.round("c_acctbal", 6).alias("acctbal")),
        key_cols=["c_custkey"],
        num_buckets=8,
    )
    return store, c, root


def _customer_era_changes(c: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The two change batches every scd2_store_* oracle rebuilds:
    era 1 — every 7th balance +100, every 13th key spawns key+1M;
    era 2 — every 5th +200, every 26th's spawned key +500."""
    changes1 = (
        c.where(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey", F.round(F.col("c_acctbal") + 100, 6).alias("acctbal")
        )
        .unionByName(
            c.where(F.col("c_custkey") % 13 == 0).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.round("c_acctbal", 6).alias("acctbal"),
            )
        )
    )
    changes2 = (
        c.where(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey", F.round(F.col("c_acctbal") + 200, 6).alias("acctbal")
        )
        .unionByName(
            c.where(F.col("c_custkey") % 26 == 0).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.round(F.col("c_acctbal") + 500, 6).alias("acctbal"),
            )
        )
    )
    return changes1, changes2


def _customer_scd2_store(spark: SparkSession, sf_dir: str, tag: str):
    """Pid-unique on-disk Scd2Store over the customer dimension with the
    two standard eras committed (see _customer_era_changes)."""
    store, c, _root = _customer_scd2_base(spark, sf_dir, tag)
    changes1, changes2 = _customer_era_changes(c)
    store.apply_era(changes1)
    store.apply_era(changes2)
    return store


def _scd2_store_eras_read(store, extra_cols: tuple = ()) -> DataFrame:
    h1 = store.history_as_of(1).withColumn(
        "as_of", F.lit(1).cast("bigint")
    )
    h2 = store.history_as_of(2).withColumn(
        "as_of", F.lit(2).cast("bigint")
    )
    return h1.unionByName(h2).select(
        "as_of", "c_custkey", "acctbal", *extra_cols, "valid_from",
        "valid_to", "is_current",
    )


@register(
    "scd2_store_snapshot_reads",
    oracle=_SCD2_TWO_ERAS_ORACLE,
    doc="Scd2Store.snapshot (round 7): same two-era customer store as "
    "scd2_store_two_eras, but AFTER snapshot(1) folds base+layer-1 into a "
    "new bucketed generation. history_as_of(1) is then served from the "
    "snapshot generation alone (one bucketed scan, zero layer scans) and "
    "history_as_of(2) from the generation + only layer 2 — read cost "
    "bounded by snapshot cadence, not total history depth — while BOTH "
    "answers must be byte-identical to the never-snapshotted store, which "
    "is why this registration reuses scd2_store_two_eras' oracle verbatim "
    "(a fold that changes any answer is a corruption, not a snapshot). "
    "Time-travel-below-snapshot and vacuum() are pinned by "
    "tests/test_scd2_store.py.",
)
def scd2_store_snapshot_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _customer_scd2_store(spark, sf_dir, "snap_reads")
    store.snapshot(1)
    return _scd2_store_eras_read(store)


@register(
    "scd2_store_schema_evolution",
    oracle="""
    WITH v AS (
      SELECT c_custkey, ROUND(c_acctbal, 6) AS acctbal,
             CAST(NULL AS VARCHAR) AS segment, 0 AS valid_from
      FROM customer
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 100, 6), NULL, 1
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS c_custkey, ROUND(c_acctbal, 6), NULL, 1
      FROM customer WHERE c_custkey % 13 = 0
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 200, 6), c_mktsegment, 2
      FROM customer WHERE c_custkey % 5 = 0
    ),
    h AS (
      SELECT a.as_of, v.c_custkey, v.acctbal, v.segment, v.valid_from
      FROM v
      CROSS JOIN (SELECT unnest([1, 2]) AS as_of) a
      WHERE v.valid_from <= a.as_of
    )
    SELECT CAST(as_of AS BIGINT) AS as_of, c_custkey, acctbal, segment,
           CAST(valid_from AS BIGINT) AS valid_from,
           CAST(COALESCE(
             LEAD(valid_from) OVER (
               PARTITION BY as_of, c_custkey ORDER BY valid_from),
             999999) AS BIGINT) AS valid_to,
           COALESCE(
             LEAD(valid_from) OVER (
               PARTITION BY as_of, c_custkey ORDER BY valid_from),
             999999) = 999999 AS is_current
    FROM h
    """,
    doc="Scd2Store ADDITIVE SCHEMA EVOLUTION (round 7): same customer "
    "store, era 1 = the standard changes, era 2 additionally carries a "
    "column the store has never seen (`segment` = c_mktsegment for every "
    "5th key). The new column joins the stored schema in the SAME atomic "
    "meta write as the era bump; reads at EVERY era — including "
    "history_as_of(1), whose layers predate the column — return the "
    "latest schema with NULL backfill (layers are scanned with the "
    "current explicit schema, the lakehouse mergeSchema contract). The "
    "oracle rebuilds both eras with the NULL-columned union. Rejections "
    "(dropped columns, validity-name collisions) and "
    "evolution-then-snapshot are pinned by tests/test_scd2_store.py.",
)
def scd2_store_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    store, c, _root = _customer_scd2_base(spark, sf_dir, "evolve")
    changes1, _ = _customer_era_changes(c)
    store.apply_era(changes1)
    store.apply_era(
        c.where(F.col("c_custkey") % 5 == 0).select(
            "c_custkey",
            F.round(F.col("c_acctbal") + 200, 6).alias("acctbal"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return _scd2_store_eras_read(store, extra_cols=("segment",))


# Shared by scd2_store_deletes (batch) and scd2_store_cdc_streamed (the
# CDC-stream twin): both build the same two eras — era 2 updates every 5th
# key AND terminates every 11th-not-5th — so the independent DuckDB
# rebuild (tombstone participates in the close window, then filtered) is
# identical; the streamed variant committing via micro-batches must not
# change any answer.
_SCD2_DELETES_ORACLE = """
    WITH v AS (
      SELECT c_custkey, ROUND(c_acctbal, 6) AS acctbal, 0 AS valid_from,
             FALSE AS tomb
      FROM customer
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 100, 6), 1, FALSE
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS c_custkey, ROUND(c_acctbal, 6), 1, FALSE
      FROM customer WHERE c_custkey % 13 = 0
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 200, 6), 2, FALSE
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey, NULL, 2, TRUE
      FROM customer WHERE c_custkey % 11 = 0 AND c_custkey % 5 <> 0
    ),
    h AS (
      SELECT a.as_of, v.c_custkey, v.acctbal, v.valid_from, v.tomb
      FROM v
      CROSS JOIN (SELECT unnest([1, 2]) AS as_of) a
      WHERE v.valid_from <= a.as_of
    ),
    closed AS (
      SELECT as_of, c_custkey, acctbal, tomb,
             CAST(valid_from AS BIGINT) AS valid_from,
             CAST(COALESCE(
               LEAD(valid_from) OVER (
                 PARTITION BY as_of, c_custkey ORDER BY valid_from),
               999999) AS BIGINT) AS valid_to
      FROM h
    )
    SELECT CAST(as_of AS BIGINT) AS as_of, c_custkey, acctbal, valid_from,
           valid_to, valid_to = 999999 AS is_current
    FROM closed WHERE NOT tomb
    """


def _customer_delete_era2(c: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(era-2 updates, era-2 delete keys) of the deletes oracle."""
    ups = c.where(F.col("c_custkey") % 5 == 0).select(
        "c_custkey", F.round(F.col("c_acctbal") + 200, 6).alias("acctbal")
    )
    dels = c.where(
        (F.col("c_custkey") % 11 == 0) & (F.col("c_custkey") % 5 != 0)
    ).select("c_custkey")
    return ups, dels


@register(
    "scd2_store_deletes",
    oracle=_SCD2_DELETES_ORACLE,
    doc="Scd2Store DELETES (round 7 — the I7 retraction side applied to "
    "dimensions): era 1 = the standard changes; era 2 updates every 5th "
    "key AND TERMINATES every 11th-not-5th key. The layer stores a "
    "tombstone row (NULL attributes, _tombstone=true) that participates "
    "in the read-time close window — the terminated key's current "
    "version closes at era 2 exactly as an update would close it — and "
    "is then filtered from every output, so layers stay append-only and "
    "pre-delete eras are untouched (as_of=1 shows the key fully open). "
    "The oracle rebuilds both eras with the same tombstone-in-window-"
    "then-filter rule. Re-insert-after-delete, snapshot/vacuum "
    "durability, and changed+deleted rejection are pinned by "
    "tests/test_scd2_store.py.",
)
def scd2_store_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    store, c, _root = _customer_scd2_base(spark, sf_dir, "deletes")
    changes1, _ = _customer_era_changes(c)
    store.apply_era(changes1)
    ups, dels = _customer_delete_era2(c)
    store.apply_era(ups, deletes=dels)
    return _scd2_store_eras_read(store)


@register(
    "scd2_store_cdc_streamed",
    oracle=_SCD2_DELETES_ORACLE,
    doc="CDC-STREAM maintenance of the Scd2Store (round 7): the same two "
    "eras as scd2_store_deletes arrive as a change feed whose rows carry "
    "a Debezium/DMS-style op marker ('u' upsert / 'd' delete); each "
    "micro-batch (maxFilesPerTrigger=1) commits as ONE era holding both "
    "sides atomically — the meta write that opens the batch's new "
    "versions is the same one that terminates its deleted keys — with "
    "the batch id as the idempotence token. The drained store must read "
    "back identically to the batch-built deletes store, hence the "
    "verbatim oracle. Unknown op values fail the batch loudly; restart/"
    "replay is pinned by tests/test_streaming_restart.py.",
)
def scd2_store_cdc_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    store, c, _root = _customer_scd2_base(spark, sf_dir, "cdc_streamed")
    changes1, _ = _customer_era_changes(c)
    ups2, dels2 = _customer_delete_era2(c)
    batch1 = changes1.withColumn("cdc_op", F.lit("u"))
    batch2 = ups2.withColumn("cdc_op", F.lit("u")).unionByName(
        dels2.select(
            "c_custkey",
            F.lit(None).cast("double").alias("acctbal"),
            F.lit("d").alias("cdc_op"),
        )
    )
    return _drain_cdc_batches(spark, store, [batch1, batch2])


def _drain_batches(spark, store, batches, start_stream) -> DataFrame:
    """Shared one-file-per-micro-batch drain scaffolding (r8 dedupe): write
    each batch as its own feed file (strictly increasing mtimes, so the
    file source delivers them in commit order and maxFilesPerTrigger=1
    makes each one micro-batch = one era), start the sink via
    ``start_stream(stream, store, checkpoint_dir)``, drain with
    availableNow, verify one era landed per batch, and return the standard
    two-era history read."""
    import glob
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="scd2_stream_")
    stream_dir = os.path.join(root, "feed")
    os.makedirs(stream_dir)
    q = None
    try:
        for i, ch in enumerate(batches, start=1):
            staging = os.path.join(root, f"stage{i}")
            ch.coalesce(1).write.parquet(staging)
            part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
            dst = os.path.join(stream_dir, f"batch{i}.parquet")
            os.rename(part, dst)
            os.utime(dst, (i, i))  # strictly increasing mtimes
        stream = (
            spark.readStream.schema(batches[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = start_stream(stream, store, os.path.join(root, "checkpoint"))
        drained = q.awaitTermination(120)
        if not drained or store.era != len(batches):
            raise RuntimeError(
                f"streamed era application incomplete: era={store.era}, "
                f"drained={drained}"
            )
    finally:
        # stop BEFORE deleting the query's source/checkpoint dirs: a
        # timed-out (still running) query would otherwise fail in the
        # background against vanishing files — or race a checkpoint
        # commit mid-delete
        if q is not None:
            q.stop()
        shutil.rmtree(root, ignore_errors=True)
    return _scd2_store_eras_read(store)


def _drain_cdc_batches(spark, store, batches) -> DataFrame:
    from ..streaming.incremental_stream import streaming_scd2_cdc

    return _drain_batches(spark, store, batches, streaming_scd2_cdc)


@register(
    "scd2_store_cdc_full_ops",
    oracle=_SCD2_DELETES_ORACLE,
    doc="The full Debezium op alphabet through the CDC sink (round 8 — "
    "VERDICT r7 ask #5): the SAME two eras as scd2_store_cdc_streamed, "
    "but the feed marks era-1 updates as 'r' (snapshot read) and era-1 "
    "inserts as 'c' (create) instead of a uniform 'u'. For an SCD2 sink "
    "every one of 'c'/'u'/'r' means \"this is the key's current version "
    "as of this batch\" — apply_era derives open-vs-supersede at read "
    "time, so the insert/update/snapshot distinction is irrelevant on "
    "the write path and the drained store must read back IDENTICALLY to "
    "the uniform-'u' stream and the batch-built deletes store: verbatim "
    "oracle. NULL and unknown ops still fail the batch loudly "
    "(tests/test_streaming_restart.py pins the op matrix).",
)
def scd2_store_cdc_full_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    store, c, _root = _customer_scd2_base(spark, sf_dir, "cdc_full_ops")
    # era 1 = _customer_era_changes' changes1, op-split: updates flow as
    # 'r' (snapshot re-read), inserts as 'c'

    upd1 = c.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100, 6).alias("acctbal"),
        F.lit("r").alias("cdc_op"),
    )
    ins1 = c.where(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.round("c_acctbal", 6).alias("acctbal"),
        F.lit("c").alias("cdc_op"),
    )
    ups2, dels2 = _customer_delete_era2(c)
    batch1 = upd1.unionByName(ins1)
    batch2 = ups2.withColumn("cdc_op", F.lit("u")).unionByName(
        dels2.select(
            "c_custkey",
            F.lit(None).cast("double").alias("acctbal"),
            F.lit("d").alias("cdc_op"),
        )
    )
    return _drain_cdc_batches(spark, store, [batch1, batch2])


# shared by scd2_store_pit_join (facts at rest, co-bucketed) and
# scd2_store_pit_streamed (facts arriving as micro-batches): identical
# semantics, so the independent DuckDB rebuild is identical — streaming
# the facts must not change any answer.
_PIT_ORACLE = """
    WITH history AS (
      SELECT c_custkey, ROUND(c_acctbal, 6) AS acctbal,
             0 AS valid_from,
             CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 999999 END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 100, 6) AS acctbal,
             1 AS valid_from, 999999 AS valid_to
      FROM customer WHERE c_custkey % 7 = 0
    ),
    fact AS (
      SELECT o_custkey,
             CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
                  THEN 1 ELSE 0 END AS era,
             o_totalprice
      FROM orders
    )
    SELECT f.era,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(h.acctbal), 6) AS acctbal_total
    FROM fact f
    JOIN history h
      ON h.c_custkey = f.o_custkey
     AND f.era >= h.valid_from AND f.era < h.valid_to
    GROUP BY f.era
    """


@register(
    "scd2_store_pit_join",
    oracle=_PIT_ORACLE,
    doc="STORE-BACKED point-in-time join (round 7, VERDICT r6 ask #4): "
    "same query as scd2_point_in_time_join (same oracle — each order "
    "joins the customer version valid in the order's pre/post-1996 era), "
    "but the history comes from a durable Scd2Store and the orders facts "
    "are bucketed on the customer key to the store's bucket spec, so "
    "Scd2Store.pit_join's split-by-touched plan applies: untouched keys "
    "(6/7 of the dimension) sort-merge join co-bucketed with ZERO "
    "Exchange on either side — the facts never shuffle — and the touched "
    "keys' full history (O(|changes|)) broadcasts. Plan pinned by "
    "tests/test_scd2_store.py::test_pit_join_cold_branch_no_exchange.",
)
def scd2_store_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    store, facts, root = _pit_store_and_facts(spark, sf_dir, "pit")
    # facts at rest, co-bucketed with the store (the 100 TB premise: facts
    # are bucketed on the dimension key at ingestion, joins never move them)
    tbl = f"pit_facts_{os.path.basename(root)}"
    (
        facts.write.format("parquet")
        .mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", os.path.join(root, "facts"))
        .saveAsTable(tbl)
    )
    joined = store.pit_join(spark.table(tbl), "era")
    return _pit_aggregate(joined)


def _pit_store_and_facts(spark: SparkSession, sf_dir: str, tag: str):
    """The PIT scenario both the at-rest and the streamed variant share:
    a one-era customer store (every 7th balance +100 — the oracle's
    history literal; the %13 spawned keys of the standard second batch
    would be dropped by the inner fact join anyway) and the orders facts
    keyed by customer with a pre/post-1996 era column."""
    store, c, root = _customer_scd2_base(spark, sf_dir, tag)
    store.apply_era(
        c.where(F.col("c_custkey") % 7 == 0).select(
            "c_custkey", F.round(F.col("c_acctbal") + 100, 6).alias("acctbal")
        )
    )
    o = load_table(spark, sf_dir, "orders")
    facts = o.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(
            F.col("o_orderdate").cast("date")
            >= F.lit("1996-01-01").cast("date"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("era"),
        "o_totalprice",
    )
    return store, facts, root


def _pit_aggregate(joined: DataFrame) -> DataFrame:
    return joined.groupBy("era").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("acctbal"), 6).alias("acctbal_total"),
    )


@register(
    "scd2_store_pit_streamed",
    oracle=_PIT_ORACLE,
    doc="STREAMED point-in-time enrichment (round 8 — the Kappa pattern "
    "completing the store's streaming surface: streaming_scd2_cdc keeps "
    "the dimension current, streaming_pit_enrich joins ARRIVING facts to "
    "the version valid at each fact's era): the same orders facts as "
    "scd2_store_pit_join arrive as two file-source micro-batches; each "
    "batch runs Scd2Store.pit_join via foreachBatch and lands in a "
    "per-batch parquet partition whose overwrite makes replays "
    "idempotent (exactly-once output under foreachBatch's at-least-once "
    "contract). The union of the partitions must aggregate identically "
    "to the at-rest join, hence the verbatim oracle. An in-flight "
    "micro-batch is small, so its cold-branch shuffle is O(batch) — the "
    "zero-Exchange co-bucketed path remains the at-rest story.",
)
def scd2_store_pit_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile

    from ..streaming.incremental_stream import streaming_pit_enrich

    store, facts, _root = _pit_store_and_facts(spark, sf_dir, "pit_stream")
    root = tempfile.mkdtemp(prefix="scd2_pit_stream_")
    feed = os.path.join(root, "feed")
    sink = os.path.join(root, "sink")
    os.makedirs(feed)
    q = None
    try:
        # two deterministic micro-batches split by customer-key parity
        for i, half in enumerate(
            [facts.where(F.col("c_custkey") % 2 == 0),
             facts.where(F.col("c_custkey") % 2 == 1)],
            start=1,
        ):
            staging = os.path.join(root, f"stage{i}")
            half.coalesce(1).write.parquet(staging)
            part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
            dst = os.path.join(feed, f"batch{i}.parquet")
            os.rename(part, dst)
            os.utime(dst, (i, i))
        stream = (
            spark.readStream.schema(facts.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = streaming_pit_enrich(
            stream, store, "era", sink, os.path.join(root, "checkpoint")
        )
        if not q.awaitTermination(120):
            raise RuntimeError("streamed PIT enrichment did not drain")
        enriched = spark.read.parquet(
            *sorted(glob.glob(os.path.join(sink, "batch=*")))
        )
        # aggregate BEFORE the temp dir vanishes (collect via localCheckpoint
        # would also work; the aggregate is 2 rows, so materialize eagerly)
        out = _pit_aggregate(enriched).localCheckpoint(eager=True)
    finally:
        if q is not None:
            q.stop()
        shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "scd2_store_streamed_eras",
    oracle=_SCD2_TWO_ERAS_ORACLE,
    doc="STREAMING dimension maintenance of the Scd2Store (round 7 — the "
    "streaming twin of apply_era, pairing SURVEY §2.9's micro-batch mode "
    "with the I6 store the way streaming_refresh pairs it with the "
    "preserve store): the two standard change batches arrive as files on "
    "a file-source stream (maxFilesPerTrigger=1, so each file is one "
    "micro-batch), foreachBatch commits each micro-batch as one era with "
    "the BATCH ID as apply_era's idempotence token — recorded in the same "
    "atomic meta write as the era bump, so a replayed batch (foreachBatch "
    "is at-least-once) returns the committed era instead of double-"
    "applying a phantom era. The drained store must read back identically "
    "to the batch-built one, hence the verbatim two-era oracle; restart/"
    "replay behavior is pinned by tests/test_streaming_restart.py.",
)
def scd2_store_streamed_eras(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental_stream import streaming_scd2_eras

    store, c, _root = _customer_scd2_base(spark, sf_dir, "streamed")
    changes1, changes2 = _customer_era_changes(c)
    return _drain_batches(
        spark, store, [changes1, changes2], streaming_scd2_eras
    )


@register(
    "scd2_store_vacuum_reads",
    oracle=_SCD2_TWO_ERAS_ORACLE,
    doc="Scd2Store.vacuum + orphan sweep (round 9 — VERDICT r8 ask #3): "
    "the standard two-era store, snapshot(1), then vacuum() with crash "
    "residue planted first (a .stage-* directory a killed mutation would "
    "leave, plus a final-positioned base_s9 a snapshot dying between its "
    "publish rename and its meta replace would leave). vacuum must "
    "reclaim the retired generation-0 base, layer e1, AND both planted "
    "orphans — the delete phase is a disk scan of everything the "
    "committed meta does not reference, so a vacuum that died between "
    "its commit and its deletes heals on the next run instead of "
    "leaking disk forever — while history_as_of(1) (served from the "
    "snapshot generation) and history_as_of(2) (generation + layer e2) "
    "still answer byte-identically to the never-vacuumed store: verbatim "
    "two-era oracle. The query raises if any orphan survives the sweep, "
    "so the driver row witnesses the reclamation, not just the reads. "
    "Crash interleavings are pinned by tests/test_store_adversarial.py.",
)
def scd2_store_vacuum_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _customer_scd2_store(spark, sf_dir, "vacuum_reads")
    store.snapshot(1)
    # plant the residue a killed mutation / crashed vacuum could leave:
    # the .stage orphan aged past occ.STAGE_RETENTION_SEC (young .stage
    # dirs may be an in-flight mutation's live staging — the sweep keeps
    # them), the final-positioned dir unconditionally unreferenced
    planted = os.path.join(store.path, ".stage-layer-0-0")
    os.makedirs(planted, exist_ok=True)
    os.utime(planted, (1, 1))
    os.makedirs(os.path.join(store.path, "base_s9"), exist_ok=True)
    store.vacuum()
    leftovers = [
        d
        for d in os.listdir(store.path)
        if d.startswith(".stage-") or d in ("base_s9", "base")
    ]
    if leftovers or os.path.isdir(store._layer_path(1)):
        raise RuntimeError(
            f"vacuum sweep left orphans behind: {leftovers}"
        )
    return _scd2_store_eras_read(store)


@register(
    "scd2_store_occ_retry",
    oracle=_SCD2_TWO_ERAS_ORACLE,
    doc="OCC loser retry lands as the next era (round 9 — VERDICT r8 ask "
    "#4, driver-gated): two writer handles on one store path; the loser "
    "stages era-2's changes and, deterministically between its stage and "
    "its commit, the winner commits era 1 (the standard changes1) — the "
    "loser's flock-guarded compare fails with ConcurrentWriteError, its "
    "staged layer never lands on a committed name, and occ.retrying "
    "re-runs it against fresh state where it commits as era 2. The final "
    "history must equal the standard two-era store EXACTLY (verbatim "
    "oracle): winner's changes at era 1, retried loser's at era 2, no "
    "phantom/clobbered layer. The query raises unless the race actually "
    "fired. Threaded stochastic interleavings are pinned by "
    "tests/test_store_adversarial.py.",
)
def scd2_store_occ_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import occ
    from ..sources.scd2_store import Scd2Store

    store, c, _root = _customer_scd2_base(spark, sf_dir, "occ_retry")
    changes1, changes2 = _customer_era_changes(c)
    winner = Scd2Store(spark, store.path)
    real_write = store._write_meta
    state = {"fired": False, "lost": False}

    def hooked(meta, *, expect, op="Scd2Store", **kw):
        if not state["fired"]:
            state["fired"] = True
            winner.apply_era(changes1)  # the winner commits era 1 first
        return real_write(meta, expect=expect, op=op, **kw)

    store._write_meta = hooked

    def attempt():
        try:
            return store.apply_era(changes2, token="era2")
        except occ.ConcurrentWriteError:
            state["lost"] = True
            raise

    era = occ.retrying(attempt)
    store._write_meta = real_write
    if not (state["fired"] and state["lost"] and era == 2):
        raise RuntimeError(
            f"deterministic OCC race did not unfold: {state}, era={era}"
        )
    return _scd2_store_eras_read(store)


# the live variant's oracle: even-key facts enriched while the dimension
# stood at era 1 (every 7th balance +100), odd-key facts after era 2
# (every 11th balance +300) landed between the two micro-batches.
_PIT_LIVE_ORACLE = """
    WITH history1 AS (
      SELECT c_custkey, ROUND(c_acctbal, 6) AS acctbal, 0 AS valid_from,
             CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 999999 END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 100, 6), 1, 999999
      FROM customer WHERE c_custkey % 7 = 0
    ),
    history2 AS (
      SELECT c_custkey, ROUND(c_acctbal, 6) AS acctbal, 0 AS valid_from,
             CASE WHEN c_custkey % 7 = 0 THEN 1
                  WHEN c_custkey % 11 = 0 THEN 2
                  ELSE 999999 END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 100, 6), 1,
             CASE WHEN c_custkey % 11 = 0 THEN 2 ELSE 999999 END
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 300, 6), 2, 999999
      FROM customer WHERE c_custkey % 11 = 0
    ),
    fact AS (
      SELECT o_custkey,
             CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1997-01-01' THEN 2
                  WHEN CAST(o_orderdate AS DATE) >= DATE '1996-01-01' THEN 1
                  ELSE 0 END AS era,
             o_custkey % 2 = 1 AS odd
      FROM orders
    )
    SELECT half, era, n_orders, acctbal_total FROM (
      SELECT 'even' AS half, f.era,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(h.acctbal), 6) AS acctbal_total
      FROM fact f JOIN history1 h
        ON h.c_custkey = f.o_custkey
       AND f.era >= h.valid_from AND f.era < h.valid_to
      WHERE NOT f.odd GROUP BY f.era
      UNION ALL
      SELECT 'odd', f.era, CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(h.acctbal), 6)
      FROM fact f JOIN history2 h
        ON h.c_custkey = f.o_custkey
       AND f.era >= h.valid_from AND f.era < h.valid_to
      WHERE f.odd GROUP BY f.era
    )
    """


@register(
    "scd2_store_pit_live",
    oracle=_PIT_LIVE_ORACLE,
    doc="LIVE point-in-time enrichment under concurrent dimension "
    "maintenance (round 9 — VERDICT r8 ask #6 under the driver gate): "
    "the PIT-enrich stream reads the store through its OWN Scd2Store "
    "instance while a SEPARATE writer instance advances the dimension "
    "between the two micro-batches (era 2: every 11th balance +300). "
    "as_of=None must resolve at EACH batch to the latest era committed "
    "on disk — the enrich side invalidates its cached meta per batch "
    "(ADVICE r8), so even-key facts (batch 1) join era-1 versions and "
    "odd-key facts (batch 2) join era-2 versions, never a torn or stale "
    "read. The union of the per-batch sink partitions must equal the "
    "serial replay of pit_join at the eras each batch saw — the oracle "
    "rebuilds both histories independently. Fact eras span 0/1/2 "
    "(pre-1996 / 1996 / 1997+), so era-2 facts exercise the new version "
    "while era-0/1 facts still match the history below it.",
)
def scd2_store_pit_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile

    from ..sources.scd2_store import Scd2Store
    from ..streaming.incremental_stream import streaming_pit_enrich

    store, c, _root = _customer_scd2_base(spark, sf_dir, "pit_live")
    store.apply_era(
        c.where(F.col("c_custkey") % 7 == 0).select(
            "c_custkey", F.round(F.col("c_acctbal") + 100, 6).alias("acctbal")
        )
    )
    o = load_table(spark, sf_dir, "orders")
    facts = o.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(
            F.col("o_orderdate").cast("date")
            >= F.lit("1997-01-01").cast("date"),
            2,
        )
        .when(
            F.col("o_orderdate").cast("date")
            >= F.lit("1996-01-01").cast("date"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("era"),
        "o_totalprice",
    )
    # the enrich side opens the SAME path as its own instance — its view
    # of the committed era must track the writer's commits per batch
    pit_store = Scd2Store(spark, store.path)
    root = tempfile.mkdtemp(prefix="scd2_pit_live_")
    feed = os.path.join(root, "feed")
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "checkpoint")
    os.makedirs(feed)

    def feed_file(df, n):
        staging = os.path.join(root, f"stage{n}")
        df.coalesce(1).write.parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dst = os.path.join(feed, f"batch{n}.parquet")
        os.rename(part, dst)
        os.utime(dst, (n, n))

    def drain():
        stream = (
            spark.readStream.schema(facts.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = streaming_pit_enrich(stream, pit_store, "era", sink, ckpt)
        try:
            if not q.awaitTermination(120):
                raise RuntimeError("live PIT enrichment did not drain")
        finally:
            q.stop()

    try:
        feed_file(facts.where(F.col("c_custkey") % 2 == 0), 1)
        drain()  # batch 0 enriched while the dimension stands at era 1
        store.apply_era(  # the WRITER instance advances the dimension
            c.where(F.col("c_custkey") % 11 == 0).select(
                "c_custkey",
                F.round(F.col("c_acctbal") + 300, 6).alias("acctbal"),
            )
        )
        feed_file(facts.where(F.col("c_custkey") % 2 == 1), 2)
        drain()  # batch 1 must see era 2 through the OTHER instance
        halves = []
        for b, half in ((0, "even"), (1, "odd")):
            halves.append(
                spark.read.parquet(os.path.join(sink, f"batch={b}"))
                .groupBy("era")
                .agg(
                    F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("acctbal"), 6).alias("acctbal_total"),
                )
                .select(F.lit(half).alias("half"), "era", "n_orders",
                        "acctbal_total")
            )
        out = halves[0].unionByName(halves[1]).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out
