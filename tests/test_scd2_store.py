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
    """Crash between the layer write and the meta bump: the orphan layer
    must be invisible to every read, the uncommitted era unreadable, and a
    retried apply_era must heal by overwriting the orphan."""
    store = _store(spark, tmp_path)
    store.apply_era(_changes1(spark))
    before = _rows(store.history_as_of())

    # simulate the crash: layer written, no commit
    store._write_layer(2, spark.createDataFrame([(1, 99.0)], "k bigint, v double"))
    assert os.path.isdir(store._layer_path(2))
    assert store.era == 1
    assert _rows(store.history_as_of()) == before
    with pytest.raises(ValueError, match="not committed"):
        store.history_as_of(2)

    # the retry commits DIFFERENT changes and must win over the orphan
    store.apply_era(_changes2(spark))
    h2 = {(r[0], r[2]): r[1] for r in _rows(store.history_as_of(2))}
    assert h2[(1, 2)] == 12.0  # retried value, not the orphan's 99.0


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
        def boom(self, meta):
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
