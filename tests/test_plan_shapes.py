"""Physical-plan regression tests: the properties that matter at 100 TB.

Correctness tests prove the small-SF answer; these prove the PLAN — that
top-k never total-sorts, small dims broadcast instead of shuffling the fact
side, and predicates reach the parquet scan. A regression here is invisible
at sf0.001 but catastrophic at cluster scale.
"""

from __future__ import annotations

from incr_iter_hadoop_spark.registry import all_queries


def _executed_plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q10_topk_is_take_ordered(spark, sf_dir):
    # orderBy().limit() must compile to TakeOrderedAndProject (per-partition
    # heap + driver merge of k rows), never a global Sort.
    plan = _executed_plan(spark, sf_dir, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_topk_customers_is_take_ordered(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "topk_customers")
    assert "TakeOrderedAndProject" in plan


def test_q19_joins_broadcast(spark, sf_dir):
    # part is a broadcast dim; the lineitem side must not shuffle for it.
    plan = _executed_plan(spark, sf_dir, "q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan


def test_q7_dims_broadcast_no_fact_shuffle_for_dims(spark, sf_dir):
    # customer/supplier/nation(x2) all broadcast: >=4 broadcast joins.
    plan = _executed_plan(spark, sf_dir, "q7_nation_volume")
    assert plan.count("BroadcastHashJoin") >= 4


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    # Every Q6 predicate must reach the parquet reader as a data filter and
    # the scan must prune to the 4 referenced columns.
    plan = _executed_plan(spark, sf_dir, "q6_forecast_revenue")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_shipdate" in scan and "l_quantity" in scan
    assert "l_orderkey" not in scan  # column pruning: unused keys not read


def test_q22_anti_join_present(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "q22_sales_opportunity")
    assert "LeftAnti" in plan


def test_salted_join_spreads_hot_key(spark, sf_dir):
    # the salted join must be a shuffle join keyed on (hot_key, _salt) —
    # no broadcast (the salt would be pointless) and the salt column must
    # reach the join keys so a hot key spans `buckets` partitions.
    plan = _executed_plan(spark, sf_dir, "join_skew_salted")
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "_salt" in plan
