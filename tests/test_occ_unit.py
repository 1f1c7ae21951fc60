"""Pure-Python unit tests for the OCC commit protocol module (r9) — the
paths the Spark-level store tests don't isolate: the non-POSIX fallback
(no flock), retry exhaustion, publish_dir replace-over-orphan, and the
stale-tmp reclamation inside the commit."""

from __future__ import annotations

import json
import os

import pytest

from incr_iter_hadoop_spark.sources import occ


def _meta_path(tmp_path):
    return str(tmp_path / "store" / "meta.json")


def test_commit_meta_sequences_and_conflicts(tmp_path):
    mp = _meta_path(tmp_path)
    assert occ.disk_seq(mp) is None
    assert occ.commit_meta({"a": 1}, mp, None, "t") == 1
    assert occ.disk_seq(mp) == 1
    assert occ.commit_meta({"a": 2}, mp, 1, "t") == 2
    with pytest.raises(occ.ConcurrentWriteError, match="advanced from"):
        occ.commit_meta({"a": 3}, mp, 1, "t")  # stale expect
    with open(mp) as f:
        assert json.load(f)["a"] == 2  # loser changed nothing


def test_commit_meta_without_flock_still_compares(tmp_path, monkeypatch):
    """Non-POSIX fallback: the compare-then-replace contract holds even
    with the lock compiled out (loud failure, not silent clobber)."""
    monkeypatch.setattr(occ, "_HAVE_FLOCK", False)
    mp = _meta_path(tmp_path)
    assert occ.commit_meta({"a": 1}, mp, None, "t") == 1
    with pytest.raises(occ.ConcurrentWriteError):
        occ.commit_meta({"a": 2}, mp, None, "t")
    assert occ.commit_meta({"a": 2}, mp, 1, "t") == 2


def test_commit_meta_reclaims_stale_tmps_but_keeps_young(tmp_path):
    mp = _meta_path(tmp_path)
    os.makedirs(os.path.dirname(mp))
    # aged residue of writers that died between dump and replace
    for i in range(3):
        p = f"{mp}.tmp.999.{i}"
        with open(p, "w") as f:
            f.write("{}")
        os.utime(p, (1, 1))
    # a YOUNG tmp may be a live no-flock writer's in-flight dump — kept
    # (unlinking it would turn its loss into FileNotFoundError instead
    # of ConcurrentWriteError)
    with open(f"{mp}.tmp.888.0", "w") as f:
        f.write("{}")
    occ.commit_meta({"a": 1}, mp, None, "t")
    leftovers = [
        d
        for d in os.listdir(os.path.dirname(mp))
        if d.startswith("meta.json.tmp.")
    ]
    assert leftovers == ["meta.json.tmp.888.0"]


def test_publish_dir_replaces_orphan(tmp_path):
    staging = tmp_path / "stage"
    final = tmp_path / "final"
    staging.mkdir()
    (staging / "data").write_text("new")
    final.mkdir()
    (final / "data").write_text("orphan")
    occ.publish_dir(str(staging), str(final))
    assert (final / "data").read_text() == "new"
    assert not staging.exists()


def test_retrying_exhausts_and_propagates():
    calls = {"n": 0}

    def always_loses():
        calls["n"] += 1
        raise occ.ConcurrentWriteError("nope")

    with pytest.raises(occ.ConcurrentWriteError, match="nope"):
        occ.retrying(always_loses, attempts=4, backoff_sec=0.001)
    assert calls["n"] == 4


def test_retrying_returns_first_success():
    calls = {"n": 0}

    def wins_third():
        calls["n"] += 1
        if calls["n"] < 3:
            raise occ.ConcurrentWriteError("again")
        return "ok"

    assert occ.retrying(wins_third, attempts=5) == "ok"
    assert calls["n"] == 3


def test_stage_is_young_and_retention(tmp_path):
    d = tmp_path / ".stage-x-1-0"
    d.mkdir()
    assert occ.stage_is_young(str(d))  # just created
    os.utime(d, (1, 1))
    assert not occ.stage_is_young(str(d))  # aged past retention
    assert not occ.stage_is_young(str(tmp_path / "missing"))


def test_commit_meta_reclaims_aged_pre_r9_bare_tmp(tmp_path):
    """The pre-r9 SHARED tmp name (bare 'meta.json.tmp', residue of a
    pre-upgrade crash between dump and replace) is reclaimed once aged —
    the '.tmp.*' glob never matched it (ADVICE r9) — while a YOUNG bare
    tmp (a not-yet-upgraded concurrent writer's in-flight dump on a
    no-flock filesystem) is kept."""
    mp = _meta_path(tmp_path)
    os.makedirs(os.path.dirname(mp))
    bare = f"{mp}.tmp"
    with open(bare, "w") as f:
        f.write("{}")
    os.utime(bare, (1, 1))  # aged past retention
    occ.commit_meta({"a": 1}, mp, None, "t")
    assert not os.path.exists(bare)
    # young bare tmp survives the next commit
    with open(bare, "w") as f:
        f.write("{}")
    occ.commit_meta({"a": 2}, mp, 1, "t")
    assert os.path.exists(bare)


def test_commit_meta_retention_override(tmp_path):
    """retention_sec=0 reclaims even fresh residue (the stores thread
    their stage_retention_sec through here); the default keeps it."""
    mp = _meta_path(tmp_path)
    os.makedirs(os.path.dirname(mp))
    with open(f"{mp}.tmp.999.0", "w") as f:
        f.write("{}")
    occ.commit_meta({"a": 1}, mp, None, "t")  # default window: kept
    assert os.path.exists(f"{mp}.tmp.999.0")
    occ.commit_meta({"a": 2}, mp, 1, "t", retention_sec=0)
    assert not os.path.exists(f"{mp}.tmp.999.0")


def test_final_is_sweepable_gates_only_without_flock(tmp_path, monkeypatch):
    """Under flock an unreferenced final-positioned directory is always
    crash residue (the sweep holds the lock publish+commit run under) —
    sweepable immediately. Without flock it may be a concurrent writer's
    just-published-not-yet-committed data: only aged residue is
    sweepable (ADVICE r9)."""
    d = tmp_path / "base_s7"
    d.mkdir()
    assert occ.final_is_sweepable(str(d))  # flock available: always
    monkeypatch.setattr(occ, "_HAVE_FLOCK", False)
    assert not occ.final_is_sweepable(str(d))  # young: may be live
    os.utime(d, (1, 1))
    assert occ.final_is_sweepable(str(d))  # aged residue
    assert not occ.final_is_sweepable(str(d), retention_sec=10**12)
