"""Temperature-scaled mixture properties (round 12, VERDICT r11 ask #6).

Oracle parity pins the exact output; these pin the MIXING SEMANTICS —
the temperature rule actually reweights (small sources get a larger
budget share relative to their size than big sources), the upsampling
epochs are non-vacuous, and every source's consumed tokens respect its
integer budget.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from incr_iter_hadoop_spark.catalog import load_table
from incr_iter_hadoop_spark.operators.sampling import (
    _TEMP_BUDGET_TOTAL,
    _budget_positions,
    sample_mixture_temperature,
)


def _per_source(spark, sf_dir):
    out = sample_mixture_temperature(spark, sf_dir)
    return {
        r["source"]: r
        for r in out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("epoch").alias("max_epoch"),
            F.max("cum").alias("max_cum"),
            F.max(F.col("cum") - F.col("tok")).alias("max_start"),
        )
        .collect()
    }


def _source_totals(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    _, bt = _budget_positions(d, "temp")
    return {
        r["source"]: r["stot"]
        for r in bt.groupBy("source")
        .agg(F.sum("btot").alias("stot"))
        .collect()
        if r["stot"] > 0
    }


def test_budgets_match_sqrt_temperature_rule(spark, sf_dir):
    """budget_i = (TOTAL * floor(sqrt(stot_i))) div sum(wt) — and every
    source's selected token stream STARTS strictly inside its budget."""
    stot = _source_totals(spark, sf_dir)
    wt = {s: math.isqrt(t) for s, t in stot.items()}
    wsum = sum(wt.values())
    budgets = {s: (_TEMP_BUDGET_TOTAL * w) // wsum for s, w in wt.items()}
    per = _per_source(spark, sf_dir)
    assert set(per) == {s for s, b in budgets.items() if b > 0}
    for s, row in per.items():
        # keep gate: cum - tok < budget, and the stream is gap-free from 0
        assert row["max_start"] < budgets[s]
        # the next doc after the last kept one would start >= budget:
        # max_cum either exhausts the final epoch's corpus or >= budget
        n_ep = -(-budgets[s] // stot[s])
        assert row["max_cum"] >= min(budgets[s], n_ep * stot[s])
        assert row["max_epoch"] == n_ep - 1


def test_upsampling_epochs_are_exercised(spark, sf_dir):
    per = _per_source(spark, sf_dir)
    assert max(r["max_epoch"] for r in per.values()) >= 1, (
        "no source repeats — the temperature budget is too small to "
        "exercise epoch cycling at this sf"
    )


def test_temperature_flattens_relative_shares(spark, sf_dir):
    """alpha = 1/2 up-weights small sources: the budget/stot ratio of the
    smallest source must be >= that of the largest (strictly, unless all
    sources are the same size)."""
    stot = _source_totals(spark, sf_dir)
    small = min(stot, key=stot.get)
    big = max(stot, key=stot.get)
    wt = {s: math.isqrt(t) for s, t in stot.items()}
    wsum = sum(wt.values())
    r_small = (_TEMP_BUDGET_TOTAL * wt[small]) / wsum / stot[small]
    r_big = (_TEMP_BUDGET_TOTAL * wt[big]) / wsum / stot[big]
    assert r_small >= r_big
