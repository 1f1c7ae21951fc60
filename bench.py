#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Protocol (BASELINE.md): relational battery + iterative PageRank to
convergence + k-means + incremental refresh, wall-clock per query at sf0.1.
Each query is materialized via a count-style action (no driver collect of
payload rows); the JVM is warmed with one throwaway action first so the
headline numbers measure the queries, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family (SURVEY.md §2 / BASELINE.md protocol)
HEADLINE = [
    "q1_pricing_summary",      # scan + hash agg (relational battery anchor)
    "q5_multiway_join",        # multiway broadcast join
    "window_battery",          # window functions
    "agg_value_battery",       # A5 aggregation framework
    "pagerank_converged",      # iterative loop to convergence
    "kmeans_assign",           # ONE2ALL broadcast assignment step
    "spmv_bounded2",           # ONE2MUL blocked SpMV
    "incr_refresh_orders",     # incremental view maintenance (preserve+refresh)
    "dedup_minhash_pairs",     # MinHash LSH dedup (100 TB path)
    "ann_bruteforce_topk",     # brute-force ANN baseline
]


def main() -> None:
    from incr_iter_hadoop_spark.registry import all_queries
    from incr_iter_hadoop_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = all_queries()
    # warm the JVM + parquet footers once so q1 doesn't pay session startup
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            print(f"bench: skipping unknown query {name}", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))
    # BASELINE.md protocol: record runs for regression tracking
    try:
        import datetime

        os.makedirs("bench/results", exist_ok=True)
        stamp = datetime.date.today().isoformat()
        with open(f"bench/results/{stamp}.json", "a") as f:
            f.write(json.dumps(result) + "\n")
    except OSError:
        pass  # read-only checkout: stdout line is the contract


if __name__ == "__main__":
    main()
