"""Oscillation-guarded LPA termination (round 13 — VERDICT r12 ask #3).

Synchronous label propagation 2-cycles on bipartite structure, so "no
change" alone never terminates there; ``label_propagation_converged``
must stop at the first round whose state equals the state one round back
(fixpoint) OR two rounds back (period-2 limit cycle). These tests pin
that rule on fixtures where the answer is computable by hand: a complete
bipartite K3,3 and a 2-node matching, both of which PROVABLY oscillate
forever under the plain rule, plus a fixpoint-reaching star to show the
period-1 path still fires first when it can.
"""

from __future__ import annotations

import pytest

from incr_iter_hadoop_spark.operators.iterative import (
    label_propagation,
    label_propagation_converged,
)


def _k33(spark):
    # distinct label spaces on the two sides => labels swap wholesale:
    # round 1 (L=10, R=0), round 2 (L=0, R=10), round 3 = round 1, ...
    return spark.createDataFrame(
        [(a, b) for a in (0, 1, 2) for b in (10, 11, 12)],
        "src bigint, dst bigint",
    )


def test_bipartite_k33_stops_via_period2(spark):
    res = label_propagation_converged(_k33(spark), max_iterations=20)
    assert res.converged
    # round 1: everything changes; round 2: the anti-phase state (min over
    # p1/p2 is the 4 nodes that differ from the INITIAL state); round 3
    # equals round 1 => period-2 detection fires, distance 0.
    assert res.iterations == 3
    assert res.distances == [6.0, 4.0, 0.0]
    state = {
        r.node: r.label
        for r in res.state.select("node", "label").collect()
    }
    # the returned state is the cycle phase at the detected round (round 3
    # == round 1): left side wears the smallest right label and vice versa
    assert state == {0: 10, 1: 10, 2: 10, 10: 0, 11: 0, 12: 0}


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_bipartite_oscillates_forever_without_the_guard(spark):
    # the motivating failure: bounded plain LPA at ANY even/odd horizon
    # yields the two alternating phases — no fixpoint exists, so a naive
    # "stop when unchanged" loop would spin to max-iter
    r4 = label_propagation(_k33(spark), max_iterations=4)
    r5 = label_propagation(_k33(spark), max_iterations=5)
    s4 = {r.node: r.label for r in r4.state.collect()}
    s5 = {r.node: r.label for r in r5.state.collect()}
    assert s4 != s5
    assert s4 == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}
    assert s5 == {0: 10, 1: 10, 2: 10, 10: 0, 11: 0, 12: 0}


def test_matching_pair_stops_via_period2(spark):
    # the smallest oscillator: one matched edge swaps labels every round.
    # Its 2-cycle includes the INITIAL state (round 2 == round 0), so the
    # period-2 rule fires at round 2: distances [2, 0].
    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    res = label_propagation_converged(edges, max_iterations=10)
    assert res.converged
    assert res.iterations == 2
    assert res.distances == [2.0, 0.0]


def test_triangle_reaches_fixpoint_via_period1(spark):
    # an ODD cycle (non-bipartite) has a true fixpoint: triangle {0,1,2}
    # -> round 1 (1,0,0), round 2 all-0, round 3 unchanged. Note even a
    # STAR oscillates (hub vs leaves is bipartite) — only non-bipartite
    # structure can terminate via the period-1 rule.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src bigint, dst bigint"
    )
    res = label_propagation_converged(edges, max_iterations=10)
    assert res.converged
    assert res.iterations == 3
    assert res.distances == [3.0, 1.0, 0.0]
    state = {r.node: r.label for r in res.state.select("node", "label").collect()}
    assert state == {0: 0, 1: 0, 2: 0}


def test_max_iter_fallback_reports_not_converged(spark):
    # horizon too short to ever measure a period-2 equality => the I4
    # max-iter fallback returns the bounded state, converged=False
    res = label_propagation_converged(_k33(spark), max_iterations=2)
    assert not res.converged
    assert res.iterations == 2


@pytest.mark.parametrize("max_iterations", [3, 10])
def test_detection_round_independent_of_horizon(spark, max_iterations):
    res = label_propagation_converged(
        _k33(spark), max_iterations=max_iterations
    )
    assert res.converged and res.iterations == 3
