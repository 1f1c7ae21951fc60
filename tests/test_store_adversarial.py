"""Adversarial/hostile-content coverage for the two on-disk stores
(VERDICT r6 ask #5 + the four ADVICE r6 findings).

What can actually go wrong, and is pinned here:

- **Nested store roots** (a store created inside another store's layer
  directory): the version/era stamp is parsed from ``input_file_name()``,
  and an unanchored leftmost regex would match the OUTER path segment and
  silently stamp the wrong ``valid_from``/``_v`` on every row. The fix
  anchors the match to the data-file position.
- **Catalog-name collisions**: ``_table_name`` slugs the store path by
  collapsing non-alphanumerics, so ``/x/a-b`` and ``/x/a_b`` used to map
  to one catalog table; ``initialize()`` DROPs the name, clobbering the
  other live store's entry. The fix appends a hash of the raw path.
- **Scd2Store key hygiene** (PreserveStore already rejected NULLs):
  NULL keys in the base dim or in changes, and duplicate keys within one
  era (two versions sharing a ``valid_from`` make the read-time ``lead()``
  window nondeterministic), are rejected loudly BEFORE anything is
  written — a failed apply must leave the committed era untouched.
- **Hostile key/attribute content** (unicode, newlines, quotes,
  backslashes, empty strings) through the bucketed write + window read;
  empty-changes eras.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incr_iter_hadoop_spark.operators.incremental import scd2_apply
from incr_iter_hadoop_spark.sources.preserve_store import PreserveStore
from incr_iter_hadoop_spark.sources.scd2_store import Scd2Store

OPEN_END = 999_999


def _hist_rows(df):
    return sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    )


# ---------------------------------------------------------------------------
# Scd2Store key hygiene
# ---------------------------------------------------------------------------


def test_scd2_initialize_rejects_null_keys(spark, tmp_path):
    dim = spark.createDataFrame([(1, 1.0), (None, 2.0)], "k bigint, v double")
    store = Scd2Store(spark, str(tmp_path / "s"))
    with pytest.raises(ValueError, match="NULL key"):
        store.initialize(dim, key_cols=["k"])
    assert not store.exists()


def test_scd2_apply_era_rejects_null_keys_and_leaves_era_intact(spark, tmp_path):
    store = Scd2Store(spark, str(tmp_path / "s"))
    store.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"), key_cols=["k"]
    )
    bad = spark.createDataFrame([(None, 9.0)], "k bigint, v double")
    with pytest.raises(ValueError, match="NULL key"):
        store.apply_era(bad)
    assert store.era == 0
    assert _hist_rows(store.history_as_of()) == [(1, 1.0, 0, OPEN_END, True)]


def test_scd2_apply_era_rejects_duplicate_keys_per_era(spark, tmp_path):
    """Two versions of one key in a single era would share valid_from, so
    lead() would close one of them into a zero-width [e, e) interval
    nondeterministically — the contract is one row per key per era, and it
    is enforced, not assumed (ADVICE r6)."""
    store = Scd2Store(spark, str(tmp_path / "s"))
    store.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"), key_cols=["k"]
    )
    dup = spark.createDataFrame([(1, 2.0), (1, 3.0)], "k bigint, v double")
    with pytest.raises(ValueError, match="duplicate keys"):
        store.apply_era(dup)
    assert store.era == 0  # failed apply commits nothing
    ok = spark.createDataFrame([(1, 2.0)], "k bigint, v double")
    assert store.apply_era(ok) == 1


def test_scd2_apply_era_rejects_duplicate_composite_keys(spark, tmp_path):
    store = Scd2Store(spark, str(tmp_path / "s"))
    store.initialize(
        spark.createDataFrame(
            [(1, "a", 1.0)], "k1 bigint, k2 string, v double"
        ),
        key_cols=["k1", "k2"],
    )
    dup = spark.createDataFrame(
        [(1, "a", 2.0), (1, "a", 3.0), (2, "b", 4.0)],
        "k1 bigint, k2 string, v double",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        store.apply_era(dup)


def test_scd2_empty_changes_era_commits_and_reads(spark, tmp_path):
    """A no-op refresh window is legal: the era commits, history is
    unchanged except that the new era is addressable."""
    store = Scd2Store(spark, str(tmp_path / "s"))
    store.initialize(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"),
        key_cols=["k"],
    )
    empty = spark.createDataFrame([], "k bigint, v double")
    assert store.apply_era(empty) == 1
    store.apply_era(spark.createDataFrame([(1, 9.0)], "k bigint, v double"))
    assert _hist_rows(store.history_as_of(1)) == _hist_rows(
        store.history_as_of(0)
    )
    assert _hist_rows(store.history_as_of(2)) == [
        (1, 1.0, 0, 2, False),
        (1, 9.0, 2, OPEN_END, True),
        (2, 2.0, 0, OPEN_END, True),
    ]


# ---------------------------------------------------------------------------
# Hostile key content through the bucketed write + window read
# ---------------------------------------------------------------------------

HOSTILE_KEYS = [
    "plain",
    "uniçødé 日本語",
    "embedded\nnewline",
    'quo"te\'s',
    "back\\slash",
    "",  # empty string is a legal (non-NULL) key
    "  leading and trailing  ",
    "comma,semicolon;tab\there",
]


def test_scd2_hostile_string_keys_roundtrip(spark, tmp_path):
    """Unicode/newline/quote/backslash/empty keys survive the bucketed
    parquet write, the catalog DDL, and the window read — and the store's
    reconstruction still equals chained scd2_apply on the same data."""
    dim = spark.createDataFrame(
        [(k, float(i)) for i, k in enumerate(HOSTILE_KEYS)],
        "k string, v double",
    )
    changes = spark.createDataFrame(
        [(k, float(i) + 100.0) for i, k in enumerate(HOSTILE_KEYS[:4])],
        "k string, v double",
    )
    store = Scd2Store(spark, str(tmp_path / "s"))
    store.initialize(dim, key_cols=["k"], num_buckets=4)
    store.apply_era(changes)

    base = dim.select(
        "k",
        "v",
        F.lit(0).cast("bigint").alias("valid_from"),
        F.lit(OPEN_END).cast("bigint").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    expected = scd2_apply(base, changes, key_cols=["k"], era=1)
    assert _hist_rows(store.history_as_of()) == _hist_rows(expected)


def test_preserve_hostile_string_group_keys_roundtrip(spark, tmp_path):
    """Same hostile content through PreserveStore's bucketed base + layered
    refresh: results must match a from-scratch recompute."""
    rows = [(k, i, float(i + 1)) for i, k in enumerate(HOSTILE_KEYS)]
    contribs = spark.createDataFrame(rows, "g string, s bigint, v double")
    store = PreserveStore(spark, str(tmp_path / "p"))
    store.initialize(
        contribs,
        group_keys=["g"],
        source_keys=["s"],
        agg_sql={"total": "CAST(SUM(v) AS DOUBLE)"},
        num_buckets=4,
    )
    delta = spark.createDataFrame(
        [(HOSTILE_KEYS[1], 100, 50.0, "+"), (HOSTILE_KEYS[2], 2, 3.0, "-")],
        "g string, s bigint, v double, op string",
    )
    store.refresh(delta)
    got = {r["g"]: r["total"] for r in store.current_results().collect()}
    assert got[HOSTILE_KEYS[1]] == pytest.approx(2.0 + 50.0)
    assert HOSTILE_KEYS[2] not in got  # its only contrib was retracted
    assert got[HOSTILE_KEYS[0]] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Nested store roots: the version-stamp regex must not match the outer path
# ---------------------------------------------------------------------------


def test_scd2_store_nested_inside_layer_dir_stamps_correct_eras(
    spark, tmp_path
):
    """A store rooted under another store's layer directory (path contains
    /layers/e1/) must still stamp ITS OWN layer numbers — the unanchored
    leftmost match would have returned 1 for every layer (ADVICE r6)."""
    outer = Scd2Store(spark, str(tmp_path / "outer"))
    outer.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"), key_cols=["k"]
    )
    outer.apply_era(spark.createDataFrame([(2, 2.0)], "k bigint, v double"))

    nested_root = os.path.join(outer._layer_path(1), "nested_store")
    inner = Scd2Store(spark, nested_root)
    inner.initialize(
        spark.createDataFrame([(10, 1.0)], "k bigint, v double"),
        key_cols=["k"],
    )
    inner.apply_era(spark.createDataFrame([(10, 2.0)], "k bigint, v double"))
    inner.apply_era(spark.createDataFrame([(10, 3.0)], "k bigint, v double"))
    assert _hist_rows(inner.history_as_of()) == [
        (10, 1.0, 0, 1, False),
        (10, 2.0, 1, 2, False),
        (10, 3.0, 2, OPEN_END, True),
    ]
    # the outer store never sees the squatter (layers are addressed by
    # exact era paths, not directory listing)
    assert _hist_rows(outer.history_as_of()) == [
        (1, 1.0, 0, OPEN_END, True),
        (2, 2.0, 1, OPEN_END, True),
    ]


def test_preserve_store_nested_inside_layer_dir_stamps_correct_versions(
    spark, tmp_path
):
    outer = PreserveStore(spark, str(tmp_path / "outer"))
    outer.initialize(
        spark.createDataFrame([(1, 1, 1.0)], "g bigint, s bigint, v double"),
        group_keys=["g"],
        source_keys=["s"],
        agg_sql={"total": "CAST(SUM(v) AS DOUBLE)"},
        num_buckets=2,
    )
    outer.refresh(
        spark.createDataFrame(
            [(1, 2, 5.0, "+")], "g bigint, s bigint, v double, op string"
        )
    )

    nested_root = os.path.join(
        outer._layer_path(1, "results"), "nested_store"
    )
    inner = PreserveStore(spark, nested_root)
    inner.initialize(
        spark.createDataFrame([(7, 1, 1.0)], "g bigint, s bigint, v double"),
        group_keys=["g"],
        source_keys=["s"],
        agg_sql={"total": "CAST(SUM(v) AS DOUBLE)"},
        num_buckets=2,
    )
    # two refreshes of the same group: last-layer-wins needs _v stamped 1,2
    inner.refresh(
        spark.createDataFrame(
            [(7, 2, 10.0, "+")], "g bigint, s bigint, v double, op string"
        )
    )
    inner.refresh(
        spark.createDataFrame(
            [(7, 3, 100.0, "+")], "g bigint, s bigint, v double, op string"
        )
    )
    got = {r["g"]: r["total"] for r in inner.current_results().collect()}
    assert got == {7: pytest.approx(111.0)}


# ---------------------------------------------------------------------------
# Catalog-name injectivity: slug-colliding paths must not clobber each other
# ---------------------------------------------------------------------------


def test_scd2_slug_colliding_paths_are_distinct_stores(spark, tmp_path):
    """/x/a-b and /x/a_b collapse to the same slug; before the path-hash
    suffix the second initialize() DROPped and re-pointed the first
    store's catalog table (ADVICE r6)."""
    s1 = Scd2Store(spark, str(tmp_path / "a-b"))
    s1.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"), key_cols=["k"]
    )
    s2 = Scd2Store(spark, str(tmp_path / "a_b"))
    s2.initialize(
        spark.createDataFrame([(2, 2.0)], "k bigint, v double"), key_cols=["k"]
    )
    assert s1._table_name() != s2._table_name()
    assert _hist_rows(s1.history_as_of()) == [(1, 1.0, 0, OPEN_END, True)]
    assert _hist_rows(s2.history_as_of()) == [(2, 2.0, 0, OPEN_END, True)]


def test_preserve_slug_colliding_paths_are_distinct_stores(spark, tmp_path):
    p1 = PreserveStore(spark, str(tmp_path / "a-b"))
    p1.initialize(
        spark.createDataFrame([(1, 1, 1.0)], "g bigint, s bigint, v double"),
        group_keys=["g"],
        source_keys=["s"],
        agg_sql={"total": "CAST(SUM(v) AS DOUBLE)"},
        num_buckets=2,
    )
    p2 = PreserveStore(spark, str(tmp_path / "a_b"))
    p2.initialize(
        spark.createDataFrame([(2, 1, 9.0)], "g bigint, s bigint, v double"),
        group_keys=["g"],
        source_keys=["s"],
        agg_sql={"total": "CAST(SUM(v) AS DOUBLE)"},
        num_buckets=2,
    )
    assert p1._table_name("results") != p2._table_name("results")
    assert {r["g"]: r["total"] for r in p1.current_results().collect()} == {
        1: pytest.approx(1.0)
    }
    assert {r["g"]: r["total"] for r in p2.current_results().collect()} == {
        2: pytest.approx(9.0)
    }


# ---------------------------------------------------------------------------
# Single-writer contract: optimistic concurrency (VERDICT r7 ask #3)
# ---------------------------------------------------------------------------
#
# Every mutation captures the store's on-disk commit sequence when it
# BEGINS and re-checks it at the atomic meta commit: of two concurrent
# writers exactly one wins and the loser raises ConcurrentWriteError — the
# lakehouse optimistic-commit discipline, replacing the previously
# documented-but-unenforced single-writer note. The tests interleave
# deterministically by hooking the loser's commit to let the winner land
# first (the realistic race window is the seconds of Spark work between
# begin and commit).

from incr_iter_hadoop_spark.sources.occ import ConcurrentWriteError  # noqa: E402

# r14 (VERDICT r13 ask #6): stress/property suite excluded from the
# default run so the driver's verify window completes; run everything
# with  pytest -m "slow or not slow"  (see pytest.ini).
pytestmark = pytest.mark.slow



def test_scd2_two_writer_race_exactly_one_wins(spark, tmp_path):
    path = str(tmp_path / "s")
    a = Scd2Store(spark, path)
    a.initialize(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"),
        key_cols=["k"],
    )
    b = Scd2Store(spark, path)

    real_write = b._write_meta

    def hooked(meta, *, expect, op="Scd2Store", **kw):
        # the competing writer commits while b sits between its layer
        # write and its meta commit
        a.apply_era(
            spark.createDataFrame([(1, 10.0)], "k bigint, v double")
        )
        return real_write(meta, expect=expect, op=op, **kw)

    b._write_meta = hooked
    with pytest.raises(ConcurrentWriteError, match="concurrent writer"):
        b.apply_era(
            spark.createDataFrame([(1, 99.0)], "k bigint, v double")
        )
    # the store holds exactly the winner's commit; the loser's layer is an
    # invisible orphan (era count did not double-advance)
    fresh = Scd2Store(spark, path)
    assert fresh.era == 1
    assert _hist_rows(fresh.history_as_of()) == [
        (1, 1.0, 0, 1, False),
        (1, 10.0, 1, OPEN_END, True),
        (2, 2.0, 0, OPEN_END, True),
    ]


def test_scd2_snapshot_loses_race_to_apply_era(spark, tmp_path):
    path = str(tmp_path / "s")
    a = Scd2Store(spark, path)
    a.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"),
        key_cols=["k"],
    )
    a.apply_era(spark.createDataFrame([(1, 2.0)], "k bigint, v double"))
    b = Scd2Store(spark, path)
    real_write = b._write_meta

    def hooked(meta, *, expect, op="Scd2Store", **kw):
        a.apply_era(
            spark.createDataFrame([(1, 3.0)], "k bigint, v double")
        )
        return real_write(meta, expect=expect, op=op, **kw)

    b._write_meta = hooked
    with pytest.raises(ConcurrentWriteError):
        b.snapshot(1)
    fresh = Scd2Store(spark, path)
    assert fresh.era == 2
    assert fresh.snaps == [0]  # the losing snapshot never became visible


def test_preserve_two_writer_race_exactly_one_wins(spark, tmp_path):
    path = str(tmp_path / "p")
    a = PreserveStore(spark, path)
    a.initialize(
        spark.createDataFrame(
            [(1, 1, 1.0), (2, 2, 2.0)], "g bigint, s bigint, v double"
        ),
        group_keys=["g"],
        source_keys=["s"],
        agg_sql={"total": "CAST(SUM(v) AS DOUBLE)"},
        num_buckets=2,
    )
    b = PreserveStore(spark, path)
    real_write = b._write_meta

    def hooked(meta, *, expect, op="PreserveStore", **kw):
        a.refresh(
            spark.createDataFrame(
                [(1, 10, 5.0, "+")], "g bigint, s bigint, v double, op string"
            )
        )
        return real_write(meta, expect=expect, op=op, **kw)

    b._write_meta = hooked
    with pytest.raises(ConcurrentWriteError, match="concurrent writer"):
        b.refresh(
            spark.createDataFrame(
                [(2, 20, 9.0, "+")], "g bigint, s bigint, v double, op string"
            )
        )
    fresh = PreserveStore(spark, path)
    assert fresh.version == 1
    got = {r["g"]: r["total"] for r in fresh.current_results().collect()}
    # only the winner's delta is in the state
    assert got == {1: pytest.approx(6.0), 2: pytest.approx(2.0)}


def test_occ_pre_r8_meta_reads_as_seq_zero_and_upgrades(spark, tmp_path):
    """A store written before OCC existed (no commit_seq in meta.json) is
    still writable: its sequence reads as 0 and the first post-upgrade
    commit stamps 1."""
    import json

    path = str(tmp_path / "s")
    store = Scd2Store(spark, path)
    store.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"),
        key_cols=["k"],
    )
    mp = os.path.join(path, "meta.json")
    with open(mp) as f:
        meta = json.load(f)
    meta.pop("commit_seq", None)
    with open(mp, "w") as f:
        json.dump(meta, f)
    fresh = Scd2Store(spark, path)
    assert fresh.apply_era(
        spark.createDataFrame([(1, 2.0)], "k bigint, v double")
    ) == 1
    assert int(fresh.meta["commit_seq"]) == 1


def test_scd2_vacuum_loses_race_deletes_nothing(spark, tmp_path):
    """vacuum commits BEFORE deleting (r8): the OCC compare precedes the
    irreversible rmtree, so a vacuum losing the race to a concurrent
    apply_era fails with every generation and layer still on disk —
    committed data referenced by the winner's meta is never destroyed."""
    path = str(tmp_path / "s")
    a = Scd2Store(spark, path)
    a.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"),
        key_cols=["k"],
    )
    a.apply_era(spark.createDataFrame([(1, 2.0)], "k bigint, v double"))
    a.snapshot(1)
    b = Scd2Store(spark, path)
    real_write = b._write_meta

    def hooked(meta, *, expect, op="Scd2Store", **kw):
        a.apply_era(
            spark.createDataFrame([(1, 3.0)], "k bigint, v double")
        )
        return real_write(meta, expect=expect, op=op, **kw)

    b._write_meta = hooked
    with pytest.raises(ConcurrentWriteError):
        b.vacuum()
    # nothing was deleted: the pre-snapshot generation and its layers are
    # intact and every era is still readable through a fresh open
    fresh = Scd2Store(spark, path)
    assert os.path.isdir(fresh._base_path(0))
    assert fresh.vacuumed_below == 0
    assert fresh.era == 2
    cur = {r["k"]: r["v"] for r in
           fresh.history_as_of(1).where("is_current").collect()}
    assert cur == {1: 2.0}


def test_preserve_compact_loses_race_serves_committed_state(spark, tmp_path):
    """A compact that loses the OCC race must not leave its UNCOMMITTED
    meta cached on the store object: reads after the failure must serve
    the committed state (which includes the winner's refresh), not the
    orphan base the loser wrote."""
    path = str(tmp_path / "p")
    a = PreserveStore(spark, path)
    a.initialize(
        spark.createDataFrame(
            [(1, 1, 1.0), (2, 2, 2.0)], "g bigint, s bigint, v double"
        ),
        group_keys=["g"],
        source_keys=["s"],
        agg_sql={"total": "CAST(SUM(v) AS DOUBLE)"},
        num_buckets=2,
    )
    a.refresh(
        spark.createDataFrame(
            [(1, 10, 5.0, "+")], "g bigint, s bigint, v double, op string"
        )
    )
    b = PreserveStore(spark, path)
    real_write = b._write_meta

    def hooked(meta, *, expect, op="PreserveStore", **kw):
        a.refresh(
            spark.createDataFrame(
                [(2, 20, 9.0, "+")], "g bigint, s bigint, v double, op string"
            )
        )
        return real_write(meta, expect=expect, op=op, **kw)

    b._write_meta = hooked
    with pytest.raises(ConcurrentWriteError):
        b.compact()
    # the SAME loser object must now read the committed state — base_v0 +
    # both refreshes — not its orphan compacted base (which lacks the
    # winner's group-2 delta)
    got = {r["g"]: r["total"] for r in b.current_results().collect()}
    assert got == {1: pytest.approx(6.0), 2: pytest.approx(11.0)}
    assert b.version == 2  # committed meta, not the orphan's version 0


# ---------------------------------------------------------------------------
# vacuum orphan reclamation (r9, VERDICT r8 ask #3): a crash between
# vacuum's commit and its deletes must be a TEMPORARY disk leak — the next
# vacuum re-derives the orphan set from disk and reclaims it.
# ---------------------------------------------------------------------------


def test_scd2_vacuum_crash_after_commit_heals_on_next_vacuum(
    spark, tmp_path
):
    path = str(tmp_path / "s")
    store = Scd2Store(spark, path)
    store.initialize(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"),
        key_cols=["k"],
        num_buckets=2,
    )
    store.apply_era(spark.createDataFrame([(1, 10.0)], "k bigint, v double"))
    store.apply_era(spark.createDataFrame([(2, 20.0)], "k bigint, v double"))
    store.snapshot(2)
    # crash between the meta commit and the sweep
    real_sweep = store._sweep_orphans
    store._sweep_orphans = lambda retain_sec=0.0: (_ for _ in ()).throw(
        RuntimeError("simulated crash after commit, before deletes")
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.vacuum()
    # the commit landed; the orphans are still on disk (the r8 leak)
    fresh = Scd2Store(spark, path)
    assert fresh.snaps == [2] and fresh.vacuumed_below == 2
    assert os.path.isdir(os.path.join(path, "base"))  # retired gen 0
    assert os.path.isdir(os.path.join(path, "layers/e1"))
    # every read still answers from meta
    assert _hist_rows(fresh.history_as_of()) == [
        (1, 1.0, 0, 1, False),
        (1, 10.0, 1, OPEN_END, True),
        (2, 2.0, 0, 2, False),
        (2, 20.0, 2, OPEN_END, True),
    ]
    # the next vacuum reclaims the orphans from the disk scan
    fresh.vacuum()
    assert not os.path.isdir(os.path.join(path, "base"))
    assert not os.path.isdir(os.path.join(path, "layers/e1"))
    assert not os.path.isdir(os.path.join(path, "layers/e2"))
    assert os.path.isdir(os.path.join(path, "base_s2"))  # live generation
    assert _hist_rows(Scd2Store(spark, path).history_as_of()) == [
        (1, 1.0, 0, 1, False),
        (1, 10.0, 1, OPEN_END, True),
        (2, 2.0, 0, 2, False),
        (2, 20.0, 2, OPEN_END, True),
    ]
    store._sweep_orphans = real_sweep


def test_scd2_crashed_snapshot_orphans_swept_by_vacuum(spark, tmp_path):
    """A snapshot() that dies mid-flight leaves either a ``.stage-*``
    orphan (died before publish — simulated by crashing the commit) or a
    final-positioned but UNCOMMITTED ``base_s<era>`` (died between the
    publish rename and the meta replace — simulated by writing the dir
    directly). Both are invisible to every reader and the next vacuum
    reclaims both."""
    path = str(tmp_path / "s")
    store = Scd2Store(spark, path)
    store.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"),
        key_cols=["k"],
        num_buckets=2,
    )
    store.apply_era(spark.createDataFrame([(1, 2.0)], "k bigint, v double"))
    real_write = store._write_meta

    def crash(meta, *, expect, op="Scd2Store", **kw):
        raise RuntimeError("simulated crash before snapshot commit")

    store._write_meta = crash
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.snapshot(1)
    store._write_meta = real_write
    # the exception path cleaned its own staging; a kill -9 could not —
    # plant the .stage orphan a killed attempt would leave, AGED past the
    # retention window (young .stage dirs may be live staging and are
    # deliberately kept by the sweep)
    planted = os.path.join(path, ".stage-base_s1-99999-0")
    os.makedirs(planted)
    os.utime(planted, (1, 1))
    # died-between-publish-and-meta-replace: final-positioned orphan
    spark.createDataFrame([(9, 9.0)], "k bigint, v double").write.parquet(
        os.path.join(path, "base_s1")
    )
    fresh = Scd2Store(spark, path)
    assert fresh.snaps == [0]  # neither orphan was ever committed
    assert _hist_rows(fresh.history_as_of()) == [
        (1, 1.0, 0, 1, False),
        (1, 2.0, 1, OPEN_END, True),
    ]
    fresh.vacuum()
    assert not os.path.isdir(os.path.join(path, "base_s1"))
    assert not [d for d in os.listdir(path) if d.startswith(".stage-")]
    assert _hist_rows(fresh.history_as_of()) == [
        (1, 1.0, 0, 1, False),
        (1, 2.0, 1, OPEN_END, True),
    ]


def test_preserve_vacuum_crash_after_commit_heals_on_next_vacuum(
    spark, tmp_path
):
    path = str(tmp_path / "p")
    store = PreserveStore(spark, path)
    store.initialize(
        spark.createDataFrame(
            [(1, 1, 1.0), (2, 2, 2.0)], "g bigint, s bigint, v double"
        ),
        group_keys=["g"],
        source_keys=["s"],
        agg_sql={"total": "CAST(SUM(v) AS DOUBLE)"},
        num_buckets=2,
    )
    store.refresh(
        spark.createDataFrame(
            [(1, 10, 5.0, "+")], "g bigint, s bigint, v double, op string"
        )
    )
    store.compact()
    assert store.meta["retired"] == {"0": 1}
    real_sweep = store._sweep_orphans
    store._sweep_orphans = lambda retain_sec=0.0: (_ for _ in ()).throw(
        RuntimeError("simulated crash after commit, before deletes")
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.vacuum()
    fresh = PreserveStore(spark, path)
    assert fresh.meta.get("retired", {}) == {}  # the commit landed
    assert os.path.isdir(os.path.join(path, "base_v0"))  # the r8 leak
    fresh.vacuum()  # heals: re-derives orphans from disk
    assert not os.path.isdir(os.path.join(path, "base_v0"))
    assert not os.path.isdir(os.path.join(path, "layers/b0"))
    assert os.path.isdir(os.path.join(path, "base_v1"))  # live base
    got = {r["g"]: r["total"] for r in fresh.current_results().collect()}
    assert got == {1: pytest.approx(6.0), 2: pytest.approx(2.0)}
    store._sweep_orphans = real_sweep


# ---------------------------------------------------------------------------
# threaded OCC contention (r9, VERDICT r8 ask #2): measure the contract
# under real thread interleaving instead of constructing it. The r9 commit
# runs under a per-store flock on a FRESH fd (excludes sibling threads) and
# data files stage+rename inside the critical section, so N retrying
# writers must converge to exactly the serial model.
# ---------------------------------------------------------------------------


def test_scd2_threaded_contention_retry_converges(spark, tmp_path):
    import threading

    from incr_iter_hadoop_spark.sources import occ

    path = str(tmp_path / "s")
    Scd2Store(spark, path).initialize(
        spark.createDataFrame(
            [(k, -1.0) for k in range(4)], "k bigint, v double"
        ),
        key_cols=["k"],
        num_buckets=2,
    )
    n_threads, n_ops = 4, 3
    errors = []

    def worker(t: int) -> None:
        try:
            st = Scd2Store(spark, path)  # one instance per writer
            for i in range(n_ops):
                df = spark.createDataFrame(
                    [(t, float(i))], "k bigint, v double"
                )
                occ.retrying(
                    lambda df=df, i=i: st.apply_era(
                        df, token=f"w{t}-op{i}"
                    ),
                    attempts=200,
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(t,))
        for t in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    fresh = Scd2Store(spark, path)
    total = n_threads * n_ops
    # every op committed exactly once: the era count and the commit
    # sequence both equal the number of successful commits
    assert fresh.era == total
    assert int(fresh.meta["commit_seq"]) == 1 + total
    # per-key history equals the thread's serial submission order (eras
    # interleave across threads, but each thread's ops are ordered)
    hist = fresh.history_as_of()
    for t in range(n_threads):
        vals = [
            r["v"]
            for r in hist.where(f"k = {t}").orderBy("valid_from").collect()
        ]
        assert vals == [-1.0] + [float(i) for i in range(n_ops)], (t, vals)
    # and no staged directory leaked into a committed layer name
    eras = {
        int(d[1:])
        for d in os.listdir(os.path.join(path, "layers"))
        if d.startswith("e")
    }
    assert eras == set(range(1, total + 1))


def test_preserve_threaded_contention_retry_converges(spark, tmp_path):
    import threading

    from incr_iter_hadoop_spark.sources import occ

    path = str(tmp_path / "p")
    PreserveStore(spark, path).initialize(
        spark.createDataFrame(
            [(g, 0, 0.0) for g in range(3)], "g bigint, s bigint, v double"
        ),
        group_keys=["g"],
        source_keys=["s"],
        agg_sql={"total": "CAST(SUM(v) AS DOUBLE)"},
        num_buckets=2,
    )
    n_threads, n_ops = 3, 2
    errors = []

    def worker(t: int) -> None:
        try:
            st = PreserveStore(spark, path)
            for i in range(n_ops):
                df = spark.createDataFrame(
                    [(t, 10 + i, float(i + 1), "+")],
                    "g bigint, s bigint, v double, op string",
                )
                occ.retrying(
                    lambda df=df, i=i: st.refresh(df, token=f"w{t}-op{i}"),
                    attempts=200,
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(t,))
        for t in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    fresh = PreserveStore(spark, path)
    total = n_threads * n_ops
    assert fresh.version == total
    # initialize is one staged commit (r9), then one commit per refresh
    assert int(fresh.meta["commit_seq"]) == 1 + total
    got = {r["g"]: r["total"] for r in fresh.current_results().collect()}
    # each group's final total = its thread's serial sum (0 base + 1 + 2)
    assert got == {g: pytest.approx(3.0) for g in range(n_threads)}


def test_occ_retrying_loser_lands_as_next_era(spark, tmp_path):
    """occ.retrying (r9, VERDICT r8 ask #4): a ConcurrentWriteError loser
    re-runs against fresh state and lands as the NEXT era after the
    winner's; the token keeps the retry idempotent."""
    from incr_iter_hadoop_spark.sources import occ

    path = str(tmp_path / "s")
    a = Scd2Store(spark, path)
    a.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"),
        key_cols=["k"],
    )
    b = Scd2Store(spark, path)
    real_write = b._write_meta
    state = {"interfered": False}

    def hooked(meta, *, expect, op="Scd2Store", **kw):
        if not state["interfered"]:
            state["interfered"] = True
            # the winner commits while b sits between stage and commit
            a.apply_era(
                spark.createDataFrame([(1, 10.0)], "k bigint, v double")
            )
        return real_write(meta, expect=expect, op=op, **kw)

    b._write_meta = hooked
    era = occ.retrying(
        lambda: b.apply_era(
            spark.createDataFrame([(1, 99.0)], "k bigint, v double"),
            token="retry-me",
        )
    )
    assert state["interfered"]
    assert era == 2  # the loser retried and landed AFTER the winner
    # a replay with the same token is a no-op returning the committed era
    assert (
        b.apply_era(
            spark.createDataFrame([(1, 77.0)], "k bigint, v double"),
            token="retry-me",
        )
        == 2
    )
    fresh = Scd2Store(spark, path)
    assert _hist_rows(fresh.history_as_of()) == [
        (1, 1.0, 0, 1, False),
        (1, 10.0, 1, 2, False),
        (1, 99.0, 2, OPEN_END, True),
    ]


def test_scd2_sweep_respects_concurrent_commit_and_young_staging(
    spark, tmp_path
):
    """r9 review fixes: (1) the sweep runs under the store lock on a FRESH
    meta read, so a generation committed by another writer between
    vacuum's commit and its sweep is never mistaken for an orphan;
    (2) .stage-* directories inside the retention window (possibly an
    in-flight mutation's live staging) are kept, aged ones reclaimed."""
    path = str(tmp_path / "s")
    a = Scd2Store(spark, path)
    a.initialize(
        spark.createDataFrame([(1, 1.0)], "k bigint, v double"),
        key_cols=["k"],
        num_buckets=2,
    )
    a.apply_era(spark.createDataFrame([(1, 2.0)], "k bigint, v double"))
    a.snapshot(1)

    young = os.path.join(path, ".stage-layer-7777-0")
    aged = os.path.join(path, ".stage-layer-8888-0")
    os.makedirs(young)
    os.makedirs(aged)
    os.utime(aged, (1, 1))

    real_sweep = a._sweep_orphans

    def interfering_sweep(retain_sec=0.0):
        # another writer commits era 2 + generation 2 between vacuum's
        # commit and its sweep
        b = Scd2Store(spark, path)
        b.apply_era(
            spark.createDataFrame([(1, 3.0)], "k bigint, v double")
        )
        b.snapshot(2)
        real_sweep(retain_sec)

    a._sweep_orphans = interfering_sweep
    a.vacuum()
    a._sweep_orphans = real_sweep

    # the concurrent writer's committed generation survived the sweep
    assert os.path.isdir(os.path.join(path, "base_s2"))
    assert os.path.isdir(young)  # possibly-live staging kept
    assert not os.path.isdir(aged)  # crashed-attempt residue reclaimed
    fresh = Scd2Store(spark, path)
    assert fresh.snaps == [1, 2] and fresh.era == 2
    assert _hist_rows(fresh.history_as_of()) == [
        (1, 1.0, 0, 1, False),
        (1, 2.0, 1, 2, False),
        (1, 3.0, 2, OPEN_END, True),
    ]
