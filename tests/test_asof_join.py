"""Contract tests for asof_join_backward: backward-inclusive vs strict tie
handling, and the one-struct payload rule that keeps legitimately-NULL right
columns from bleeding values of older rows."""

from __future__ import annotations

import pytest

from incr_iter_hadoop_spark.operators.joins import asof_join_backward


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        "k int, t int, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100, "x"), (1, 15, 150, None), (2, 99, 990, "z")],
        "k int, rt int, rv int, tag string",
    )
    return left, right


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_backward_inclusive_matches_equal_ts(spark):
    left, right = _frames(spark)
    out = asof_join_backward(left, right, ["k"], left_ts="t", right_ts="rt")
    rows = {(r.k, r.t): (r.rt, r.rv, r.tag) for r in out.collect()}
    assert rows[(1, 10)] == (10, 100, "x")  # equal ts visible (inclusive)
    assert rows[(1, 20)] == (15, 150, None)  # latest <=, NULL tag NOT
    # back-filled from the older (rt=10, tag='x') row: payload is atomic
    assert rows[(1, 5)] == (None, None, None)  # nothing at-or-before
    assert rows[(2, 7)] == (None, None, None)  # right row is in the future


def test_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, ["k"], left_ts="t", right_ts="rt", strict=True
    )
    rows = {(r.k, r.t): r.rt for r in out.collect()}
    assert rows[(1, 10)] is None  # equal ts no longer visible
    assert rows[(1, 20)] == 15
