"""Gopher duplicate-line/paragraph fractions — the REAL newline path.

The registered query (text_dup_line_stats) runs on synthesized token
chunks because the sf corpora carry no newlines; this suite pins the
actual '\n' / '\n\n' split operator (gopher_dup_lines) against an
independent pure-Python reference implementing the Dolma/Gopher
formulas (every occurrence of a repeated segment is "duplicate"), on
hostile docs: empty, whitespace-only, single line, ALL-identical lines,
trailing/leading newlines, repeated paragraphs with distinct lines.
"""

from __future__ import annotations

from collections import Counter

import pytest

from incr_iter_hadoop_spark.operators.textops import gopher_dup_lines


def _ref(text: str):
    """Pure-Python Dolma/Gopher reference: count-weighted and
    char-weighted duplicate fractions over non-blank segments."""

    def stats(segs):
        segs = [s for s in segs if s.strip()]
        if not segs:
            return None
        c = Counter(segs)
        n = len(segs)
        dup_n = sum(v for v in c.values() if v > 1)
        chars = sum(len(s) for s in segs)
        dup_chars = sum(len(s) * v for s, v in c.items() if v > 1)
        return n, dup_n / n, dup_chars / chars

    lines = stats(text.split("\n"))
    paras = stats(text.split("\n\n"))
    if lines is None:
        return None
    return {
        "n_lines": lines[0],
        "n_paras": paras[0],
        "dup_line_frac": lines[1],
        "dup_line_char_frac": lines[2],
        "dup_para_frac": paras[1],
        "dup_para_char_frac": paras[2],
    }


DOCS = [
    "",  # empty: dropped
    "   \n  \n ",  # whitespace-only: dropped
    "just one line",  # single line: all zeros
    "same\nsame\nsame\nsame",  # ALL identical lines: frac 1.0
    "a\nb\nc\nd",  # all distinct: 0.0
    "looong line here\nx\nlooong line here\ny",  # char-weighting matters
    "p one l1\np one l2\n\np one l1\np one l2\n\ndistinct para",
    "\n\nleading and trailing\n\n",
    "alpha\nbeta\n\nalpha\nbeta",  # para dup == whole halves
    "tail newline\n",
]


@pytest.mark.parametrize("i", range(len(DOCS)))
def test_gopher_dup_lines_matches_python_reference(spark, i):
    text = DOCS[i]
    df = spark.createDataFrame([(0, text)], "id long, body string")
    rows = gopher_dup_lines(df, "id", "body").collect()
    exp = _ref(text)
    if exp is None:
        assert rows == [], (text, rows)
        return
    assert len(rows) == 1
    r = rows[0].asDict()
    for k, v in exp.items():
        assert r[k] == pytest.approx(v), (text, k, r, exp)


def test_all_identical_lines_is_fully_duplicate(spark):
    df = spark.createDataFrame(
        [(0, "same\nsame\nsame")], "id long, body string"
    )
    r = gopher_dup_lines(df, "id", "body").collect()[0]
    assert r["dup_line_frac"] == 1.0
    assert r["dup_line_char_frac"] == 1.0
    # the whole doc is ONE paragraph (no blank line): nothing repeats
    assert r["n_paras"] == 1 and r["dup_para_frac"] == 0.0


def test_gopher_dup_lines_random_batch_matches_reference(spark):
    """Deterministic pseudo-random batch: 40 docs assembled from a small
    line alphabet with random '\n'/'\n\n' separators — every doc must
    match the pure-Python Dolma reference exactly (count- and
    char-weighted, lines and paragraphs)."""
    import random

    rng = random.Random(20260815)
    alphabet = ["alpha", "beta beta", "g", "", "  ", "long line " * 3]
    docs = []
    for i in range(40):
        parts = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        seps = [rng.choice(["\n", "\n\n"]) for _ in parts]
        docs.append((i, "".join(p + s for p, s in zip(parts, seps))))
    df = spark.createDataFrame(docs, "id long, body string")
    got = {r["id"]: r.asDict() for r in gopher_dup_lines(df, "id", "body").collect()}
    for i, text in docs:
        exp = _ref(text)
        if exp is None:
            assert i not in got, (i, text, got.get(i))
            continue
        assert i in got, (i, text)
        for k, v in exp.items():
            assert got[i][k] == pytest.approx(v), (i, repr(text), k, got[i], exp)
