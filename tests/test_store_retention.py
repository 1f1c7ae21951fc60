"""Store-level stage-retention parameter (r10, VERDICT r9 ask #4): the
sweep's in-flight-staging protection window is a per-store constructor
parameter (``stage_retention_sec``), not only the module constant — a
store whose mutations stage for >1h widens it; tests/ops that want fast
residue reclamation narrow it. Both settings are exercised through real
store instances, WITHOUT monkeypatching ``occ.STAGE_RETENTION_SEC``.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from incr_iter_hadoop_spark.sources.preserve_store import PreserveStore
from incr_iter_hadoop_spark.sources.scd2_store import Scd2Store


def _dim(spark):
    return spark.range(4).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _mk_stage(root: str, name: str) -> str:
    p = os.path.join(root, name)
    os.makedirs(p)
    with open(os.path.join(p, "part-0.parquet"), "w") as f:
        f.write("x")
    return p


def test_scd2_young_stage_orphan_survives_default_retention(
    spark, tmp_path
):
    store = Scd2Store(spark, str(tmp_path / "scd2")).initialize(
        _dim(spark), key_cols=["k"], num_buckets=2
    )
    live = _mk_stage(store.path, ".stage-layer-999-0")
    store.vacuum()
    assert os.path.isdir(live)  # young: may be a live writer's staging


def test_scd2_zero_retention_reclaims_young_stage_orphan(spark, tmp_path):
    store = Scd2Store(
        spark, str(tmp_path / "scd2"), stage_retention_sec=0
    ).initialize(_dim(spark), key_cols=["k"], num_buckets=2)
    residue = _mk_stage(store.path, ".stage-layer-999-0")
    layer_residue = _mk_stage(
        os.path.join(store.path, "layers"), ".stage-layer-999-1"
    )
    store.vacuum()
    assert not os.path.exists(residue)
    assert not os.path.exists(layer_residue)
    # the store itself is untouched
    assert store.history_as_of().count() == 4


def test_scd2_retention_parameter_does_not_mutate_module_default(
    spark, tmp_path
):
    from incr_iter_hadoop_spark.sources import occ

    before = occ.STAGE_RETENTION_SEC
    store = Scd2Store(
        spark, str(tmp_path / "scd2"), stage_retention_sec=0
    ).initialize(_dim(spark), key_cols=["k"], num_buckets=2)
    store.vacuum()
    assert occ.STAGE_RETENTION_SEC == before
    # a second store at the default window still protects young stages
    other = Scd2Store(spark, str(tmp_path / "other")).initialize(
        _dim(spark), key_cols=["k"], num_buckets=2
    )
    live = _mk_stage(other.path, ".stage-base-1-0")
    other.vacuum()
    assert os.path.isdir(live)


def _preserve(spark, tmp_path, **kw):
    src = spark.range(8).select(
        F.col("id").alias("g"), F.col("id").alias("x")
    )
    store = PreserveStore(spark, str(tmp_path / "pres"), **kw)
    store.initialize(
        src,
        group_keys=["g"],
        source_keys=["g"],
        agg_sql={"s": "sum(x)"},
        num_buckets=2,
    )
    return store


def test_preserve_zero_retention_reclaims_young_stage_orphan(
    spark, tmp_path
):
    store = _preserve(spark, tmp_path, stage_retention_sec=0)
    residue = _mk_stage(store.path, ".stage-base-999-0")
    store.vacuum()
    assert not os.path.exists(residue)


def test_preserve_young_stage_orphan_survives_default_retention(
    spark, tmp_path
):
    store = _preserve(spark, tmp_path)
    live = _mk_stage(store.path, ".stage-base-999-0")
    store.vacuum()
    assert os.path.isdir(live)


def test_scd2_vacuum_retain_protects_young_retired_generation(
    spark, tmp_path
):
    """vacuum(retain_sec): a just-retired generation stays readable on
    disk inside the window (in-flight readers may hold plans over it);
    a later vacuum with retain 0 reclaims it (Delta VACUUM RETAIN)."""
    store = Scd2Store(spark, str(tmp_path / "scd2")).initialize(
        _dim(spark), key_cols=["k"], num_buckets=2
    )
    store.apply_era(
        spark.createDataFrame([(1, 99)], "k bigint, v bigint")
    )
    store.snapshot(1)
    old_gen = os.path.join(store.path, "base")
    assert os.path.isdir(old_gen)
    store.vacuum(retain_sec=3600)
    assert os.path.isdir(old_gen)  # young retired gen: retained
    assert store.snaps == [1]  # the meta commit still happened
    store.vacuum()  # retain 0: reclaimed
    assert not os.path.exists(old_gen)


def test_vacuum_retain_clock_runs_from_retirement_not_mtime(
    spark, tmp_path
):
    """r10 review: a generation WRITTEN long ago but retired one second
    ago must still be protected by the retain window — age runs from
    when a retaining sweep first saw the artifact unreferenced
    (occ.retention_clock's .retired-at marker), never from the
    directory mtime."""
    store = Scd2Store(spark, str(tmp_path / "scd2")).initialize(
        _dim(spark), key_cols=["k"], num_buckets=2
    )
    store.apply_era(
        spark.createDataFrame([(1, 99)], "k bigint, v bigint")
    )
    store.snapshot(1)
    old_gen = os.path.join(store.path, "base")
    os.utime(old_gen, (1, 1))  # the generation's files are "hours old"
    store.vacuum(retain_sec=3600)
    # first retaining sight: clock starts, nothing reclaimed
    assert os.path.isdir(old_gen)
    assert os.path.isfile(os.path.join(old_gen, ".retired-at"))
    store.vacuum(retain_sec=3600)
    # still inside the window measured from first sight
    assert os.path.isdir(old_gen)
    # age the RETIREMENT marker past the window: now reclaimable
    os.utime(os.path.join(old_gen, ".retired-at"), (1, 1))
    store.vacuum(retain_sec=3600)
    assert not os.path.exists(old_gen)
