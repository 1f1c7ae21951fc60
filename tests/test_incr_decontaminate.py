"""Incremental decontamination under a GROWING benchmark.

The delta pass probes only the NEW benchmark split's grams against the
preserved corpus fingerprints and unions hit positions with the preserved
old hits — and must equal the full recompute over (old ∪ new) EXACTLY,
including the case the sf fixture cannot produce: old-split and new-split
passages hitting the SAME corpus doc close enough that their spans merge.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from incr_iter_hadoop_spark.operators.dedup import (
    SPAN_K,
    SPAN_KEEP_HEX,
    _fingerprint_grams,
    benchmark_gram_set,
    decontaminate_spans,
    incr_decontaminate_spans,
)


def _rand_text(rng, n):
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


def _dfs(spark, corpus_texts, old_texts, new_texts):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "id long, body string"
    )
    old_b = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(old_texts)],
        "id long, body string",
    )
    new_b = spark.createDataFrame(
        [(2000 + i, t) for i, t in enumerate(new_texts)],
        "id long, body string",
    )
    return corpus, old_b, new_b


def _incr_vs_full(spark, corpus_texts, old_texts, new_texts):
    corpus, old_b, new_b = _dfs(spark, corpus_texts, old_texts, new_texts)
    # the full recompute over the grown benchmark
    full = {
        r["id"]: (r["n_dup_spans"], r["dup_chars"])
        for r in decontaminate_spans(
            corpus, old_b.unionByName(new_b), "id", "body"
        ).collect()
    }
    # the incremental path: preserved fingerprints + old hits, new probe
    corpus_fp = _fingerprint_grams(corpus, "id", "body", SPAN_K, SPAN_KEEP_HEX)
    old_hits = (
        corpus_fp.join(
            F.broadcast(benchmark_gram_set(old_b, "id", "body")),
            "gram",
            "left_semi",
        )
        .select("id", "pos")
    )
    incr = {
        r["id"]: (r["n_dup_spans"], r["dup_chars"])
        for r in incr_decontaminate_spans(
            corpus_fp, old_hits, new_b, "id", "body"
        ).collect()
    }
    return incr, full


def test_old_and_new_spans_merge_in_one_doc(spark):
    """The case the driver fixture cannot plant: a corpus doc carrying an
    old-benchmark passage and a new-benchmark passage ADJACENT to it —
    the incremental union of hit positions must re-merge into the same
    single span the full recompute reports, not double-count."""
    rng = random.Random(42)
    old_passage = _rand_text(rng, 200)
    new_passage = _rand_text(rng, 200)
    # adjacent passages: their [pos, pos+K-1] hit intervals interleave
    contaminated = _rand_text(rng, 50) + old_passage + new_passage + _rand_text(rng, 50)
    clean = _rand_text(rng, 400)
    incr, full = _incr_vs_full(
        spark,
        [contaminated, clean],
        [_rand_text(rng, 80) + old_passage],
        [new_passage + _rand_text(rng, 80)],
    )
    assert incr == full
    assert 0 in incr and 1 not in incr


def test_empty_new_benchmark_is_identity(spark):
    rng = random.Random(7)
    passage = _rand_text(rng, 150)
    corpus_texts = [passage + _rand_text(rng, 100), _rand_text(rng, 300)]
    old_texts = [_rand_text(rng, 40) + passage]
    incr, full = _incr_vs_full(spark, corpus_texts, old_texts, [])
    assert incr == full
    assert 0 in incr


def test_new_only_contamination_detected(spark):
    """A doc untouched by the old benchmark but hit by the new split must
    appear — the preserved old hits contribute nothing for it."""
    rng = random.Random(99)
    new_passage = _rand_text(rng, 150)
    corpus_texts = [
        _rand_text(rng, 300),
        _rand_text(rng, 30) + new_passage + _rand_text(rng, 30),
    ]
    incr, full = _incr_vs_full(
        spark, corpus_texts, [_rand_text(rng, 200)], [new_passage]
    )
    assert incr == full
    assert 1 in incr and 0 not in incr


def test_duplicate_gram_across_splits_not_double_counted(spark):
    """The SAME passage present in both the old and the new benchmark
    split: hit positions coincide and the (id, pos) distinct must
    collapse them — span mass identical to either split alone."""
    rng = random.Random(3)
    passage = _rand_text(rng, 180)
    corpus_texts = [_rand_text(rng, 20) + passage + _rand_text(rng, 20)]
    incr, full = _incr_vs_full(
        spark, corpus_texts, [passage], [_rand_text(rng, 15) + passage]
    )
    assert incr == full
    assert 0 in incr
