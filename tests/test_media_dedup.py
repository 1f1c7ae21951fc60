"""Media dedup: the incremental perceptual-dedup identity.

incr_media_dedup_phash claims its output is exactly the pair INCREMENT:
base-only pairs (computed before the delta docs arrive) unioned with the
increment must equal the full media_dedup_phash result — the same
refresh-equals-recompute contract every other incremental operator in the
engine is held to. The base side runs the ENGINE's own pipeline helpers
(_phash_bands/_phash_verify) restricted to base docs, so a change to the
band layout or threshold is tested against itself, not against a stale
inline replica."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from incr_iter_hadoop_spark.catalog import load_table
from incr_iter_hadoop_spark.operators.multimodal import (
    _phash_bands,
    _phash_verify,
    ahash_media,
    attach_jpeg_phash,
    incr_media_dedup_phash,
    media_dedup_phash,
)


def _pairs(df):
    return {(r["i"], r["j"], r["hamming"]) for r in df.collect()}


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_incremental_union_base_equals_full(spark, sf_dir):
    full = _pairs(media_dedup_phash(spark, sf_dir))
    incr = _pairs(incr_media_dedup_phash(spark, sf_dir))
    # base-only pairs: the engine's own pipeline restricted to base docs
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 != 1)
    hashes = ahash_media(attach_jpeg_phash(d, "doc_id")).localCheckpoint(
        eager=True
    )
    bands = _phash_bands(hashes)
    cands = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bv"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .distinct()
    )
    base = _pairs(_phash_verify(cands, hashes))
    # BOTH sides must be non-empty or the identity is vacuous: the class-1
    # planted pairs span doc_id residues (0,1) mod 10 and land in the
    # increment; the class-27 pairs span (6,7) and stay base-only
    assert incr and base
    assert all(i % 10 == 1 or j % 10 == 1 for i, j, _ in incr)
    assert not any(i % 10 == 1 or j % 10 == 1 for i, j, _ in base)
    assert base | incr == full
    assert base & incr == set()
