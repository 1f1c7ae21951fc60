"""Media dedup: the incremental perceptual-dedup identity.

incr_media_dedup_phash claims its output is exactly the pair INCREMENT:
base-only pairs (computed before the delta docs arrive) unioned with the
increment must equal the full media_dedup_phash result — the same
refresh-equals-recompute contract every other incremental operator in the
engine is held to."""

from __future__ import annotations

from pyspark.sql import functions as F

from incr_iter_hadoop_spark.operators.multimodal import (
    _PHASH_MAX_HAMMING,
    ahash_media,
    attach_jpeg_phash,
    media_dedup_phash,
    incr_media_dedup_phash,
)
from incr_iter_hadoop_spark.catalog import load_table


def _pairs(df):
    return {(r["i"], r["j"], r["hamming"]) for r in df.collect()}


def test_incremental_union_base_equals_full(spark, sf_dir):
    full = _pairs(media_dedup_phash(spark, sf_dir))
    incr = _pairs(incr_media_dedup_phash(spark, sf_dir))
    # base-only pairs: rerun the full pipeline restricted to base docs
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 != 3)
    hashes = ahash_media(attach_jpeg_phash(d, "doc_id")).persist()
    bands = hashes.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), (F.col("lo") % 65536).alias("bv")),
                F.struct(F.lit(1).alias("band"), F.floor(F.col("lo") / 65536).cast("long").alias("bv")),
                F.struct(F.lit(2).alias("band"), (F.col("hi") % 65536).alias("bv")),
                F.struct(F.lit(3).alias("band"), F.floor(F.col("hi") / 65536).cast("long").alias("bv")),
            )
        ).alias("s"),
    ).select("doc_id", "s.band", "s.bv")
    cands = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bv"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .distinct()
    )
    ha = hashes.select(F.col("doc_id").alias("i"), F.col("lo").alias("lo_i"), F.col("hi").alias("hi_i"))
    hb = hashes.select(F.col("doc_id").alias("j"), F.col("lo").alias("lo_j"), F.col("hi").alias("hi_j"))
    hamming = F.bit_count(F.col("lo_i").bitwiseXOR(F.col("lo_j"))) + F.bit_count(
        F.col("hi_i").bitwiseXOR(F.col("hi_j"))
    )
    base = _pairs(
        cands.join(ha, "i")
        .join(hb, "j")
        .select("i", "j", hamming.cast("long").alias("hamming"))
        .where(F.col("hamming") <= _PHASH_MAX_HAMMING)
    )
    hashes.unpersist()
    # increment touches only delta docs; base pairs touch none
    assert all(i % 10 == 3 or j % 10 == 3 for i, j, _ in incr)
    assert not any(i % 10 == 3 or j % 10 == 3 for i, j, _ in base)
    assert base | incr == full
    assert base & incr == set()
