"""Hypothesis property tests for the paragraph-dedup family.

The example-based suite (tests/test_dedup_paragraphs.py) pins chosen
hostile documents; these search the input space over a 3-word vocabulary
(so cross-doc and within-doc duplicates abound) plus blank/whitespace
segments for the two CORE invariants:

- keep-first: the operator equals the sequential keep-first reference
  for ANY document set, and every distinct non-blank paragraph value
  survives exactly once corpus-wide (conservation);
- incremental == full: for ANY base/delta split, base output plus the
  incremental delta output equals the full keep-first recompute under
  arrival order (base before delta).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from incr_iter_hadoop_spark.operators.dedup import (
    _para_explode,
    dedup_paragraphs,
    incr_dedup_paragraphs,
)

# tiny vocab + blanks: collisions everywhere, every edge reachable
_SEG = st.sampled_from(["alpha", "beta", "gamma", "alpha beta", "", " "])
_DOC = st.lists(_SEG, min_size=0, max_size=5).map("\n\n".join)
_DOCS = st.lists(_DOC, min_size=1, max_size=6)

_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_keep_first(ordered_docs, sep="\n\n"):
    """Sequential keep-first over (arrival, pos): the CCNet rule stated
    directly."""
    seen: set[str] = set()
    out = {}
    for i, t in ordered_docs:
        segs = [s for s in t.split(sep) if re.search(r"\S", s)]
        if not segs:
            continue
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        out[i] = (len(segs), len(segs) - len(kept), sep.join(kept))
    return out


def _collect(df):
    return {
        r["id"]: (r["n_paras"], r["n_dropped"], r["text_clean"])
        for r in df.collect()
    }


@_SET
@given(texts=_DOCS)
def test_keep_first_equals_reference_and_conserves(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, body string"
    )
    got = _collect(dedup_paragraphs(docs, "doc_id", "body"))
    ref = _ref_keep_first(list(enumerate(texts)))
    assert got == ref
    # conservation: the kept paragraphs, over all docs, are exactly the
    # distinct non-blank paragraph values of the corpus, each once
    kept_all = [
        s
        for _, (_, _, clean) in sorted(got.items())
        for s in clean.split("\n\n")
        if s
    ]
    distinct_all = {
        s
        for t in texts
        for s in t.split("\n\n")
        if re.search(r"\S", s)
    }
    assert len(kept_all) == len(set(kept_all))
    assert set(kept_all) == distinct_all


@_SET
@given(texts=_DOCS, cut=st.integers(0, 6))
def test_incremental_equals_arrival_order_full(spark, texts, cut):
    cut = min(cut, len(texts))
    base_rows = list(enumerate(texts[:cut]))
    delta_rows = [(100 + i, t) for i, t in enumerate(texts[cut:])]
    full_ref = _ref_keep_first(base_rows + delta_rows)
    base = spark.createDataFrame(
        base_rows or [(0, "")], "doc_id long, body string"
    )
    if not base_rows:
        base = base.where("doc_id < 0")  # empty base, typed
    delta = spark.createDataFrame(
        delta_rows or [(0, "")], "doc_id long, body string"
    )
    if not delta_rows:
        delta = delta.where("doc_id < 0")
    seen = _para_explode(base, "doc_id", "body", "\n\n")[0].select(
        "para"
    ).distinct()
    got = _collect(dedup_paragraphs(base, "doc_id", "body"))
    got.update(
        _collect(incr_dedup_paragraphs(seen, delta, "doc_id", "body"))
    )
    assert got == full_ref
