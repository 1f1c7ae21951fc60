"""Large-star/small-star connected components: fixpoint equivalence with
min-label propagation, and the logarithmic round count that justifies its
existence (a path graph of diameter d converges in O(log d) rounds, where
min-label propagation needs exactly d)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from incr_iter_hadoop_spark.operators.iterative import (
    connected_components,
    connected_components_star,
)


def _labels(res):
    return {
        r["node"]: r["comp"] for r in res.state.collect()
    }


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_star_equals_minlabel_on_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(120).select(F.col("id").alias("node"))
    a = connected_components(e, nodes=nodes)
    b = connected_components_star(e, nodes=nodes)
    assert a.converged and b.converged
    assert _labels(a) == _labels(b)


def test_star_path_graph_logarithmic_rounds(spark):
    # 200-node path: diameter 199. Min-label propagation needs 199 rounds
    # (it moves labels one hop per round); the star rewrite collapses the
    # chain in O(log n).
    n = 200
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    res = connected_components_star(e, max_iterations=25)
    assert res.converged
    assert res.iterations <= 12, (
        f"expected O(log n) rounds on a path, got {res.iterations}"
    )
    labels = _labels(res)
    assert set(labels) == set(range(n))
    assert set(labels.values()) == {0}


def test_star_isolated_nodes_and_two_components(spark):
    e = spark.createDataFrame(
        [(5, 9), (9, 3), (20, 21)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(x,) for x in [3, 5, 9, 20, 21, 99]], "node long")
    res = connected_components_star(e, nodes=nodes)
    labels = _labels(res)
    assert labels == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 99: 99}


def test_star_already_converged_input(spark):
    # a star forest is a fixpoint: one round detects it and stops
    e = spark.createDataFrame([(1, 0), (2, 0), (4, 3)], "src long, dst long")
    res = connected_components_star(e)
    assert res.converged
    assert res.iterations == 1


def test_star_self_loop_only_node_is_labeled(spark):
    # a node appearing ONLY in self-loop edges must still be labeled as its
    # own singleton component — same contract as connected_components
    e = spark.createDataFrame([(5, 5), (1, 2)], "src long, dst long")
    a = connected_components(e)
    b = connected_components_star(e)
    assert _labels(a) == _labels(b) == {1: 1, 2: 1, 5: 5}
