"""Scd2Store: era-layered on-disk SCD Type-2 history (round-6 unification
of the SCD2 operator with the preserve-store layer mechanism — same
crash-consistency discipline as tests/test_preserve_store.py).

Pins the three contracts that make the store trustworthy: (1) layered
reconstruction is SEMANTICALLY IDENTICAL to chaining the pure
``scd2_apply`` transformation era by era; (2) the meta era bump is the
atomic commit point — an orphan layer from a crashed apply is invisible
and a retry heals it; (3) every committed era stays readable (time
travel), uncommitted ones are rejected loudly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incr_iter_hadoop_spark.operators.incremental import scd2_apply
from incr_iter_hadoop_spark.sources.scd2_store import Scd2Store

OPEN_END = 999_999


def _dim(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (5, 50.0)], "k bigint, v double"
    )


def _changes1(spark):
    # update key 1, insert key 4
    return spark.createDataFrame([(1, 11.0), (4, 40.0)], "k bigint, v double")


def _changes2(spark):
    # update keys 1 (again) and 2, insert key 6
    return spark.createDataFrame(
        [(1, 12.0), (2, 22.0), (6, 60.0)], "k bigint, v double"
    )


def _store(spark, tmp_path):
    store = Scd2Store(spark, str(tmp_path / "scd2"))
    store.initialize(_dim(spark), key_cols=["k"], num_buckets=4)
    return store


def _rows(df):
    return sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    )


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_history_matches_chained_scd2_apply(spark, tmp_path):
    """The unification pin: the store's derived-close reconstruction equals
    the pure transformation chained era by era."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(_changes2(spark))

    base = _dim(spark).select(
        "k",
        "v",
        F.lit(0).cast("bigint").alias("valid_from"),
        F.lit(OPEN_END).cast("bigint").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    h1 = scd2_apply(base, _changes1(spark), key_cols=["k"], era=1)
    h2 = scd2_apply(h1, _changes2(spark), key_cols=["k"], era=2)

    assert _rows(store.history_as_of(2)) == _rows(h2)
    assert _rows(store.history_as_of(1)) == _rows(h1)


def test_time_travel_reads_every_era(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(_changes2(spark))

    h0 = _rows(store.history_as_of(0))
    assert len(h0) == 4 and all(r[4] for r in h0)  # all current at era 0

    h2 = {(r[0], r[2]): (r[1], r[3], r[4]) for r in _rows(store.history_as_of(2))}
    # key 1: three versions 0→1→2, only the last current
    assert h2[(1, 0)] == (10.0, 1, False)
    assert h2[(1, 1)] == (11.0, 2, False)
    assert h2[(1, 2)] == (12.0, OPEN_END, True)
    # key 4 inserted at era 1, untouched at era 2
    assert h2[(4, 1)] == (40.0, OPEN_END, True)
    # key 5 never touched
    assert h2[(5, 0)] == (50.0, OPEN_END, True)
    # default read = latest committed era
    assert _rows(store.history_as_of()) == _rows(store.history_as_of(2))


def test_orphan_layer_from_crashed_apply_is_invisible(spark, tmp_path):
    """Crash between the publish rename and the meta replace (r9 staged
    writes — the only crash window that leaves a FINAL-positioned layer
    dir): the orphan layer must be invisible to every read, the
    uncommitted era unreadable, and a retried apply_era must heal by
    republishing over the orphan."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    before = _rows(store.history_as_of())

    # simulate the crash: layer published at its final path, no commit
    spark.createDataFrame([(1, 99.0)], "k bigint, v double").select(
        "k", "v"
    ).write.parquet(store._layer_path(2))
    assert os.path.isdir(store._layer_path(2))
    assert store.era == 1
    assert _rows(store.history_as_of()) == before
    with pytest.raises(ValueError, match="not committed"):
        store.history_as_of(2)

    # the retry commits DIFFERENT changes and must win over the orphan
    store.apply_era(_changes2(spark))
    h2 = {(r[0], r[2]): r[1] for r in _rows(store.history_as_of(2))}
    assert h2[(1, 2)] == 12.0  # retried value, not the orphan's 99.0


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_history_read_plan_constant_in_era_count(spark, tmp_path):
    """history_as_of reads layers 1..era as ONE multi-path scan (r6, same
    contract as PreserveStore): an SCD2 history never compacts, so a
    per-era scan node would grow the plan without bound. Exactly 2
    FileScans — base + the layers scan — however many eras exist."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(_changes2(spark))
    for i in range(4):
        store.apply_era(
            spark.createDataFrame([(1, 100.0 + i)], "k bigint, v double")
        )
    plan = (
        store.history_as_of()._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 2, plan.count("FileScan parquet")
    # and the fold is still correct at era 6: key 1's current value is the
    # last era's update
    cur = {r[0]: r[1] for r in _rows(store.history_as_of()) if r[4]}
    assert cur[1] == 103.0


def test_crashed_initialize_leaves_store_uninitialized(spark, tmp_path):
    """initialize() follows the same commit discipline as apply_era: the
    base snapshot is written FIRST and the meta write is the atomic commit
    point. A crash mid-initialize (simulated: meta write raises) must leave
    exists()==False — never a committed store over a partial base — and a
    retried initialize must heal by overwriting the orphan data files and
    the half-created catalog entry."""
    store = Scd2Store(spark, str(tmp_path / "scd2"))
    orig = Scd2Store._write_meta
    try:
        def boom(self, meta, **kwargs):
            raise RuntimeError("simulated crash before commit")

        Scd2Store._write_meta = boom
        with pytest.raises(RuntimeError, match="simulated crash"):
            store.initialize(_dim(spark), key_cols=["k"], num_buckets=4)
    finally:
        Scd2Store._write_meta = orig
    # orphan base data may exist on disk, but the store is NOT committed
    assert not store.exists()
    # retry heals: full initialize + an era on top reads correctly
    retried = Scd2Store(spark, str(tmp_path / "scd2"))
    retried.initialize(_dim(spark), key_cols=["k"], num_buckets=4)
    retried.apply_era(_changes1(spark))
    got = {(r[0], r[2]): r[1] for r in _rows(retried.history_as_of())}
    assert got[(1, 1)] == 11.0 and got[(4, 1)] == 40.0


def test_unknown_era_rejected(spark, tmp_path):
    store = _store(spark, tmp_path)
    with pytest.raises(ValueError, match="not committed"):
        store.history_as_of(1)
    with pytest.raises(ValueError, match="not committed"):
        store.history_as_of(-1)


def test_cross_session_reload_reregisters_catalog(spark, tmp_path):
    """A fresh store object (new 'session') must re-register the bucketed
    base table from meta.json alone."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    expected = _rows(store.history_as_of())

    spark.sql(f"DROP TABLE IF EXISTS {store._table_name()}")
    reopened = Scd2Store(spark, str(tmp_path / "scd2"))
    assert reopened.era == 1
    assert _rows(reopened.history_as_of()) == expected


# ---------------------------------------------------------------------------
# snapshot / vacuum (round 7: bounded-depth reads without losing history)
# ---------------------------------------------------------------------------


def test_snapshot_preserves_every_era_read(spark, tmp_path):
    """Time travel survives a snapshot: every history_as_of(e) — before,
    at, and after the snapshot era — returns byte-identical rows to the
    pre-snapshot store."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(_changes2(spark))
    before = {e: _rows(store.history_as_of(e)) for e in range(3)}
    assert store.snapshot(1) == 1
    assert store.snaps == [0, 1]
    for e in range(3):
        assert _rows(store.history_as_of(e)) == before[e], e
    # eras applied AFTER the snapshot layer on top of the new generation
    store.apply_era(
        spark.createDataFrame([(1, 13.0)], "k bigint, v double")
    )
    got = {(r[0], r[2]): r[1] for r in _rows(store.history_as_of(3))}
    assert got[(1, 3)] == 13.0 and got[(1, 2)] == 12.0 and got[(1, 1)] == 11.0


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_snapshot_bounds_read_plan(spark, tmp_path):
    """After snapshot(s), a read at era >= s scans the snapshot base plus
    only the layers SINCE s — the read plan is constant in the depth of
    pre-snapshot history (the 1200-refreshes/year fix)."""
    store = _store(spark, tmp_path)
    for i in range(6):
        store.apply_era(
            spark.createDataFrame([(1, 100.0 + i)], "k bigint, v double")
        )
    store.snapshot(6)
    # read at the snapshot era: ONE bucketed FileScan, no layer scan
    plan = (
        store.history_as_of(6)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1, plan
    store.apply_era(spark.createDataFrame([(1, 200.0)], "k bigint, v double"))
    plan = (
        store.history_as_of(7)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 2, plan
    got = {(r[0], r[2]): r[1] for r in _rows(store.history_as_of(7))}
    assert got[(1, 7)] == 200.0 and got[(1, 6)] == 105.0


def test_snapshot_idempotent_and_behind_newest_rejected(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(_changes2(spark))
    assert store.snapshot(2) == 2
    assert store.snapshot(2) == 2  # idempotent at a generation boundary
    with pytest.raises(ValueError, match="behind the newest"):
        store.snapshot(1)


def test_crashed_snapshot_is_invisible_and_retry_heals(spark, tmp_path):
    """Same commit discipline as apply_era: generation data STAGED first
    (r9), the publish rename + meta append form the commit point. A crash
    before the commit leaves only a .stage orphan that changes NO read,
    and the retried snapshot republishes cleanly."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    before = _rows(store.history_as_of())

    orig = Scd2Store._write_meta

    def boom(self, meta, **kwargs):
        raise RuntimeError("crash before commit")

    Scd2Store._write_meta = boom
    try:
        with pytest.raises(RuntimeError, match="crash before commit"):
            store.snapshot(1)
    finally:
        Scd2Store._write_meta = orig
    # the failed attempt cleaned its own staging (a kill -9 would leave
    # a .stage orphan for vacuum's sweep) and never published to base_s1
    assert not [d for d in os.listdir(store.path) if d.startswith(".stage-")]
    assert not os.path.isdir(store._base_path(1))
    assert store.snaps == [0]  # NOT committed
    assert _rows(store.history_as_of()) == before
    assert store.snapshot(1) == 1  # retry heals
    assert os.path.isdir(store._base_path(1))
    assert _rows(store.history_as_of()) == before


def test_vacuum_reclaims_and_rejects_pre_snapshot_eras(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(_changes2(spark))
    store.snapshot(2)
    store.apply_era(spark.createDataFrame([(1, 13.0)], "k bigint, v double"))
    h3 = _rows(store.history_as_of(3))
    store.vacuum()
    assert store.vacuumed_below == 2 and store.snaps == [2]
    # pre-snapshot artifacts are gone from disk
    assert not os.path.isdir(store._base_path(0))
    assert not os.path.isdir(store._layer_path(1))
    assert not os.path.isdir(store._layer_path(2))
    # post-snapshot layer survives; reads at/after the snapshot unchanged
    assert os.path.isdir(store._layer_path(3))
    assert _rows(store.history_as_of(3)) == h3
    for e in (0, 1):
        with pytest.raises(ValueError, match="vacuumed"):
            store.history_as_of(e)


def test_vacuum_without_snapshot_is_noop(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    before = _rows(store.history_as_of())
    store.vacuum()
    assert store.snaps == [0] and store.vacuumed_below == 0
    assert _rows(store.history_as_of()) == before


# ---------------------------------------------------------------------------
# pit_join (round 7: store-backed point-in-time join, VERDICT r6 ask #4)
# ---------------------------------------------------------------------------


def _naive_pit(history, facts, era_col):
    j = facts.join(history, "k").where(
        (F.col(era_col) >= F.col("valid_from"))
        & (F.col(era_col) < F.col("valid_to"))
    )
    return j.select(*facts.columns, "v")


def _pit_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pit_join_matches_naive_history_join(spark, tmp_path):
    """pit_join's split-by-touched plan returns exactly what the naive
    facts x history_as_of range join returns — including warm keys with 3
    versions, cold keys, missing keys, and out-of-range eras."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(_changes2(spark))
    facts = spark.createDataFrame(
        [(k, e, 10 * k + e) for k in [1, 2, 3, 4, 5, 6, 99] for e in
         [-1, 0, 1, 2, 7]],
        "k bigint, era bigint, fid bigint",
    )
    expected = _pit_rows(_naive_pit(store.history_as_of(2), facts, "era"))
    assert _pit_rows(store.pit_join(facts, "era")) == expected
    # as_of time travel: versions after era 1 invisible
    expected1 = _pit_rows(_naive_pit(store.history_as_of(1), facts, "era"))
    assert _pit_rows(store.pit_join(facts, "era", as_of=1)) == expected1


def test_pit_join_after_snapshot_multi_version_base(spark, tmp_path):
    """The cold branch must stay correct when the generation base itself
    carries multiple versions per key (post-snapshot store)."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(_changes2(spark))
    store.snapshot(2)
    store.apply_era(spark.createDataFrame([(4, 44.0)], "k bigint, v double"))
    facts = spark.createDataFrame(
        [(k, e, 10 * k + e) for k in [1, 2, 4, 5] for e in [0, 1, 2, 3]],
        "k bigint, era bigint, fid bigint",
    )
    expected = _pit_rows(_naive_pit(store.history_as_of(3), facts, "era"))
    assert _pit_rows(store.pit_join(facts, "era")) == expected


def test_pit_join_cold_branch_no_exchange(spark, tmp_path):
    """The 100 TB pin: with facts bucketed on the store's key/count, the
    cold branch (untouched keys — the overwhelming majority) sort-merge
    joins with NO Exchange on either side, and the base-side window runs
    on the bucketed distribution with NO Exchange. The only hash exchange
    in the whole plan is over layer-derived data (O(|changes|)): the
    hot-history window (the touched-keys distinct is checkpointed once,
    so its shuffle happens at build time, not in the query plan)."""
    store = Scd2Store(spark, str(tmp_path / "scd2"))
    store.initialize(
        spark.range(200).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ),
        key_cols=["k"],
        num_buckets=4,
    )
    store.apply_era(spark.createDataFrame([(1, 111.0)], "k bigint, v double"))
    facts = spark.range(600).select(
        (F.col("id") % 200).alias("k"),
        (F.col("id") % 2).cast("bigint").alias("era"),
        F.col("id").alias("fid"),
    )
    tbl = "pit_facts_bucketed_t"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        facts.write.format("parquet")
        .mode("overwrite")
        .bucketBy(4, "k")
        .sortBy("k")
        .option("path", str(tmp_path / "facts"))
        .saveAsTable(tbl)
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = store.pit_join(spark.table(tbl), "era")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("SortMergeJoin") == 1, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # and the fast path with NO layers after the generation is fully
        # exchange-free: bucketed window + co-bucketed SMJ
        store.snapshot(1)
        j2 = store.pit_join(spark.table(tbl), "era")
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan2, plan2
        assert "SortMergeJoin" in plan2, plan2
        # both plans agree with each other and with the naive join
        assert _pit_rows(j) == _pit_rows(j2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_apply_era_snapshot_cadence(spark, tmp_path):
    """snapshot_every: the PreserveStore max_layers analogue — every N
    layers past the newest generation, apply_era folds them into a new
    generation, so read depth stays bounded over an unbounded era stream
    while every era stays readable (until vacuum)."""
    store = _store(spark, tmp_path)
    for i in range(1, 8):
        store.apply_era(
            spark.createDataFrame([(1, 100.0 + i)], "k bigint, v double"),
            snapshot_every=3,
        )
    assert store.era == 7
    assert store.snaps == [0, 3, 6]
    # every era still readable, values correct at a few depths
    for e, v in [(2, 102.0), (3, 103.0), (5, 105.0), (7, 107.0)]:
        cur = {r[0]: r[1] for r in _rows(store.history_as_of(e)) if r[4]}
        assert cur[1] == v, (e, cur)


def test_pit_join_era_cache_reuses_and_invalidates(spark, tmp_path):
    """r14 (VERDICT r13 ask #8): a caller-owned era_cache memoizes the
    prepared history pieces across fact batches at the same committed era
    — identical results to the uncached plan, piece identity stable across
    calls — and a dimension advanced between batches invalidates the cache
    (new era resolved -> pieces rebuilt -> the new version is visible)."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    facts = spark.createDataFrame(
        [(k, e, 10 * k + e) for k in [1, 2, 3, 99] for e in [0, 1, 7]],
        "k bigint, era bigint, fid bigint",
    )
    cache: dict = {}
    expected = _pit_rows(store.pit_join(facts, "era"))
    got1 = _pit_rows(store.pit_join(facts, "era", era_cache=cache))
    assert got1 == expected
    pieces1 = cache["pieces"]
    # second batch at the same era: same cache entry, same result
    got2 = _pit_rows(store.pit_join(facts, "era", era_cache=cache))
    assert got2 == expected
    assert cache["pieces"] is pieces1  # reused, not rebuilt
    # dimension advances (the streaming per-batch meta invalidation path):
    # the resolved era moves, the cache must rebuild, new version visible
    store.apply_era(_changes2(spark))
    store._meta = None
    expected2 = _pit_rows(store.pit_join(facts, "era"))
    assert expected2 != expected  # era 2 changed what era-1+ facts see
    got3 = _pit_rows(store.pit_join(facts, "era", era_cache=cache))
    assert got3 == expected2
    assert cache["pieces"] is not pieces1
    assert cache["as_of"] == 2


def test_pit_join_rejects_colliding_fact_columns(spark, tmp_path):
    """Fact extracts commonly carry their own SCD bookkeeping columns; an
    ambiguous-reference failure (or positional mis-resolution) is the
    wrong way to find out — pit_join rejects the collision loudly."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    bad = spark.createDataFrame(
        [(1, 0, 5)], "k bigint, era bigint, valid_from bigint"
    )
    with pytest.raises(ValueError, match="collide"):
        store.pit_join(bad, "era")
    bad2 = spark.createDataFrame(
        [(1, 0, 5.0)], "k bigint, era bigint, v double"  # dim attr clash
    )
    with pytest.raises(ValueError, match="collide"):
        store.pit_join(bad2, "era")


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_pit_join_after_vacuum(spark, tmp_path):
    """pit_join keeps answering from the newest generation after vacuum()
    reclaims pre-snapshot artifacts; a vacuumed as_of era is rejected
    loudly instead of silently joining against a hole."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(_changes2(spark))
    store.snapshot(2)
    store.apply_era(spark.createDataFrame([(4, 44.0)], "k bigint, v double"))
    facts = spark.createDataFrame(
        [(k, e, 10 * k + e) for k in [1, 2, 4, 5, 99] for e in [0, 2, 3]],
        "k bigint, era bigint, fid bigint",
    )
    expected3 = _pit_rows(_naive_pit(store.history_as_of(3), facts, "era"))
    expected2 = _pit_rows(
        _naive_pit(store.history_as_of(2), facts, "era")
    )
    store.vacuum()
    assert _pit_rows(store.pit_join(facts, "era")) == expected3
    # the snapshot era itself survives vacuum (it IS the generation base)
    assert _pit_rows(store.pit_join(facts, "era", as_of=2)) == expected2
    with pytest.raises(ValueError, match="vacuumed"):
        store.pit_join(facts, "era", as_of=1)


# ---------------------------------------------------------------------------
# additive schema evolution (round 7)
# ---------------------------------------------------------------------------


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_schema_evolution_null_backfills_every_era(spark, tmp_path):
    """A column added mid-history joins the schema atomically with its
    era: reads at EVERY era (including ones whose layers predate the
    column) return the latest schema with NULL backfill; snapshot folds
    the evolved schema; pit_join surfaces the new attribute."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(
        spark.createDataFrame(
            [(2, 22.0, "gold"), (6, 60.0, "silver")],
            "k bigint, v double, tier string",
        )
    )
    h1 = store.history_as_of(1)
    assert "tier" in h1.columns
    assert h1.where(F.col("tier").isNotNull()).count() == 0
    h2 = store.history_as_of(2)
    tiers = {
        r["k"]: r["tier"] for r in h2.where("is_current").collect()
    }
    assert tiers[2] == "gold" and tiers[6] == "silver"
    assert tiers[1] is None and tiers[4] is None
    # fold the evolved history; answers must not change
    rows2 = _rows(h2)
    store.snapshot(2)
    assert _rows(store.history_as_of(2)) == rows2
    assert _rows(store.history_as_of(1)) == _rows(h1)
    # a later era keeps using the evolved schema, and pit_join joins it
    store.apply_era(
        spark.createDataFrame(
            [(1, 12.0, "bronze")], "k bigint, v double, tier string"
        )
    )
    facts = spark.createDataFrame(
        [(1, 0, 100), (1, 3, 101), (2, 2, 102)],
        "k bigint, era bigint, fid bigint",
    )
    got = {
        r["fid"]: (r["v"], r["tier"])
        for r in store.pit_join(facts, "era").collect()
    }
    assert got == {100: (10.0, None), 101: (12.0, "bronze"),
                   102: (22.0, "gold")}


def test_schema_evolution_is_additive_only(spark, tmp_path):
    store = _store(spark, tmp_path)
    with pytest.raises(ValueError, match="additive only"):
        store.apply_era(
            spark.createDataFrame([(9, "x")], "k bigint, tier string")
        )
    with pytest.raises(ValueError, match="derived validity"):
        store.apply_era(
            spark.createDataFrame(
                [(9, 9.0, 5)], "k bigint, v double, valid_from int"
            )
        )
    # both rejections left the store untouched
    assert store.era == 0 and store.meta["columns"] == ["k", "v"]


def test_schema_evolution_uncommitted_layer_keeps_old_schema(spark, tmp_path):
    """Crash between the evolved layer's publish and the meta commit: the
    orphan layer's extra column stays invisible — the store still reads
    (and re-applies) with the pre-evolution schema."""
    store = _store(spark, tmp_path)
    orphan = spark.createDataFrame(
        [(1, 11.0, "gold")], "k bigint, v double, tier string"
    )
    # published at its final path, no meta bump
    orphan.select("k", "v", "tier").write.parquet(store._layer_path(1))
    assert store.meta["columns"] == ["k", "v"]
    assert "tier" not in store.history_as_of().columns
    # the retried apply overwrites the orphan and commits the evolution
    store.apply_era(orphan)
    assert store.meta["columns"] == ["k", "v", "tier"]
    assert {r["k"]: r["tier"] for r in
            store.history_as_of().where("is_current").collect()}[1] == "gold"


def test_schema_evolution_survives_reload(spark, tmp_path):
    """A fresh instance on the same path (new meta read + catalog
    re-registration) sees the evolved schema, including the gen-0 base
    table whose parquet files predate the column."""
    from incr_iter_hadoop_spark.sources.scd2_store import Scd2Store

    store = _store(spark, tmp_path)
    store.apply_era(
        spark.createDataFrame(
            [(1, 11.0, "gold")], "k bigint, v double, tier string"
        )
    )
    expected = _rows(store.history_as_of())
    spark.sql(f"DROP TABLE IF EXISTS {store._table_name(0)}")
    reopened = Scd2Store(spark, store.path)
    h = reopened.history_as_of()
    assert "tier" in h.columns
    assert _rows(h) == expected


# ---------------------------------------------------------------------------
# deletes: key termination via tombstones (round 7)
# ---------------------------------------------------------------------------


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_delete_terminates_key_and_reinsert_reopens(spark, tmp_path):
    """A delete closes the current version at its era and leaves the key
    versionless until a later era re-inserts it: history shows the closed
    version (never a tombstone row), is_current drops the key, pit_join
    matches nothing in the gap, and reads below the delete era are
    untouched."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    # era 2: delete key 2, update key 3 in the same era
    store.apply_era(
        spark.createDataFrame([(3, 33.0)], "k bigint, v double"),
        deletes=spark.createDataFrame([(2,)], "k bigint"),
    )
    h2 = store.history_as_of(2)
    two = [(r["valid_from"], r["valid_to"], r["is_current"])
           for r in h2.where("k = 2").collect()]
    assert two == [(0, 2, False)]
    assert h2.where("k = 2 and is_current").count() == 0
    # era 1 history is untouched by the later delete
    assert [(r["valid_from"], r["valid_to"]) for r in
            store.history_as_of(1).where("k = 2").collect()] == [(0, 999999)]
    # era 3: re-insert key 2 — fresh version, the gap stays a gap
    store.apply_era(spark.createDataFrame([(2, 25.0)], "k bigint, v double"))
    three = sorted(
        (r["valid_from"], r["valid_to"], r["is_current"])
        for r in store.history_as_of(3).where("k = 2").collect()
    )
    assert three == [(0, 2, False), (3, 999999, True)]
    facts = spark.createDataFrame(
        [(2, 1, 100), (2, 2, 101), (2, 3, 102)],
        "k bigint, era bigint, fid bigint",
    )
    got = {r["fid"]: r["v"] for r in store.pit_join(facts, "era").collect()}
    assert got == {100: 20.0, 102: 25.0}  # fid 101 falls in the gap


def test_delete_survives_snapshot_and_vacuum(spark, tmp_path):
    """Tombstones fold into snapshot generations (still closing what they
    terminated) and survive vacuum — the termination is as durable as any
    version."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    store.apply_era(
        spark.createDataFrame([], "k bigint, v double"),
        deletes=spark.createDataFrame([(2,), (4,)], "k bigint"),
    )
    h2 = _rows(store.history_as_of(2))
    store.snapshot(2)
    assert _rows(store.history_as_of(2)) == h2
    store.apply_era(spark.createDataFrame([(4, 44.0)], "k bigint, v double"))
    expected3 = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in store.history_as_of(3)
        .where("k in (2, 4)")
        .collect()
    )
    assert expected3 == [
        (2, 0, 2, False),
        (4, 1, 2, False),
        (4, 3, 999999, True),
    ]
    store.vacuum()
    got3 = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in store.history_as_of(3).where("k in (2, 4)").collect()
    )
    assert got3 == expected3


def test_delete_rejections_leave_store_untouched(spark, tmp_path):
    store = _store(spark, tmp_path)
    with pytest.raises(ValueError, match="BOTH changes and deletes"):
        store.apply_era(
            spark.createDataFrame([(1, 13.0)], "k bigint, v double"),
            deletes=spark.createDataFrame([(1,)], "k bigint"),
        )
    with pytest.raises(ValueError, match="NULL key"):
        store.apply_era(
            spark.createDataFrame([(2, 2.0)], "k bigint, v double"),
            deletes=spark.createDataFrame([(None,)], "k bigint"),
        )
    assert store.era == 0
    assert not os.path.isdir(store._layer_path(1))


# ---------------------------------------------------------------------------
# pit_join interplay matrix (VERDICT r7 ask #4): x schema evolution,
# x deletes — both across the hot/cold branch split and a snapshot
# ---------------------------------------------------------------------------


def _pit_all_attrs(store, history, facts, era_col):
    """Naive oracle: facts x full history range-join, selecting every
    dimension attribute the store currently carries."""
    attrs = [c for c in store.meta["columns"] if c not in store.key_cols]
    j = facts.join(history, store.key_cols).where(
        (F.col(era_col) >= F.col("valid_from"))
        & (F.col(era_col) < F.col("valid_to"))
    )
    return j.select(*facts.columns, *attrs)


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_pit_join_after_schema_evolution_null_backfills(spark, tmp_path):
    """Facts whose era predates a schema evolution must see NULL for the
    evolved attribute (the version they match was written before the
    column existed); facts at or after the evolution era see its values.
    Checked against the naive history join in BOTH store shapes: layered
    (hot/cold split) and post-snapshot (evolved column folded into the
    bucketed generation base)."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))  # era 1: pre-evolution
    # era 2 evolves the schema with 'w' (update key 1, insert key 7)
    store.apply_era(
        spark.createDataFrame(
            [(1, 13.0, 7.5), (7, 70.0, 9.5)], "k bigint, v double, w double"
        )
    )
    facts = spark.createDataFrame(
        [(k, e, 10 * k + e) for k in [1, 2, 4, 7, 99] for e in [0, 1, 2, 3]],
        "k bigint, era bigint, fid bigint",
    )
    expected = _pit_rows(
        _pit_all_attrs(store, store.history_as_of(), facts, "era")
    )
    got = _pit_rows(store.pit_join(facts, "era"))
    assert got == expected
    by_fid = {
        r["fid"]: (r["v"], r["w"])
        for r in store.pit_join(facts, "era").collect()
    }
    # key 1 before the evolution: evolved attr NULL-backfilled
    assert by_fid[10] == (10.0, None)  # era 0 version
    assert by_fid[11] == (11.0, None)  # era-1 version
    # key 1 at/after the evolution: evolved value visible
    assert by_fid[12] == (13.0, 7.5)
    # a key never touched since initialize: NULL at every era
    assert by_fid[20] == (20.0, None) and by_fid[23] == (20.0, None)
    # matrix cell: snapshot folds the evolved column into the generation
    # base — the COLD branch must serve the same NULL backfill
    store.snapshot(2)
    store.apply_era(
        spark.createDataFrame([(4, 44.0, 4.5)], "k bigint, v double, w double")
    )
    expected3 = _pit_rows(
        _pit_all_attrs(store, store.history_as_of(3), facts, "era")
    )
    assert _pit_rows(store.pit_join(facts, "era")) == expected3
    cold = {
        r["fid"]: (r["v"], r["w"])
        for r in store.pit_join(facts, "era").collect()
    }
    assert cold[20] == (20.0, None)  # untouched key via the cold branch
    assert cold[43] == (44.0, 4.5)  # post-snapshot layer via the hot branch


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_pit_join_delete_gap_matrix(spark, tmp_path):
    """Facts landing in a delete gap must match nothing — in the layered
    hot branch, in the post-snapshot cold branch (tombstone folded into
    the generation base), and under as_of time travel."""
    store = _store(spark, tmp_path)
    # era 1: delete key 2, update key 1
    store.apply_era(
        spark.createDataFrame([(1, 11.0)], "k bigint, v double"),
        deletes=spark.createDataFrame([(2,)], "k bigint"),
    )
    # era 2: re-insert key 2
    store.apply_era(spark.createDataFrame([(2, 200.0)], "k bigint, v double"))
    facts = spark.createDataFrame(
        [(2, 0, 1), (2, 1, 2), (2, 2, 3), (1, 1, 4), (3, 1, 5)],
        "k bigint, era bigint, fid bigint",
    )
    expected = _pit_rows(
        _pit_all_attrs(store, store.history_as_of(), facts, "era")
    )
    got = {r["fid"]: r["v"] for r in store.pit_join(facts, "era").collect()}
    assert _pit_rows(store.pit_join(facts, "era")) == expected
    assert got == {1: 20.0, 3: 200.0, 4: 11.0, 5: 30.0}  # fid 2: the gap
    # as_of the delete era: the gap is open-ended — nothing at era >= 1
    got1 = {
        r["fid"]: r["v"]
        for r in store.pit_join(facts, "era", as_of=1).collect()
    }
    assert got1 == {1: 20.0, 4: 11.0, 5: 30.0}
    # matrix cell: snapshot(2) folds the tombstone into the generation
    # base; the gap must hold on the COLD branch (key 2 untouched after)
    store.snapshot(2)
    store.apply_era(spark.createDataFrame([(3, 33.0)], "k bigint, v double"))
    got3 = {r["fid"]: r["v"] for r in store.pit_join(facts, "era").collect()}
    assert got3 == {1: 20.0, 3: 200.0, 4: 11.0, 5: 30.0}
    assert _pit_rows(store.pit_join(facts, "era")) == _pit_rows(
        _pit_all_attrs(store, store.history_as_of(3), facts, "era")
    )


def test_token_replay_heals_skipped_cadence_snapshot(spark, tmp_path):
    """ADVICE r9: if the first attempt commits the era but dies (or loses
    an OCC race under occ.retrying) inside its cadence snapshot, the
    token-deduped REPLAY must re-check the cadence condition and fold —
    not short-circuit and leave read depth above the requested cadence
    until some future era happens to pass by."""
    store = _store(spark, tmp_path)
    # era 1 commits WITHOUT any cadence (simulating the fold having been
    # skipped by a crash after the commit)
    e = store.apply_era(_changes1(spark), token="b1")
    assert e == 1 and store.snaps == [0]
    # the at-least-once replay of the same batch carries the cadence:
    # token dedupe returns the committed era AND heals the fold
    e2 = store.apply_era(_changes1(spark), token="b1", snapshot_every=1)
    assert e2 == 1
    assert store.snaps == [0, 1]
    # the healed fold serves the same current rows
    cur = {r[0]: r[1] for r in _rows(store.history_as_of()) if r[4]}
    assert 1 in cur and 2 in cur
