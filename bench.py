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
    "q10_returned_items",      # join → agg → global top-k (TakeOrdered)
    "window_battery",          # window functions
    "agg_value_battery",       # A5 aggregation framework
    "pagerank_converged",      # iterative loop to convergence
    "kmeans_assign",           # ONE2ALL broadcast assignment step
    "spmv_bounded2",           # ONE2MUL blocked SpMV
    "incr_refresh_orders",     # incremental view maintenance (preserve+refresh)
    "incr_pagerank_delta5",    # delta-applied PageRank (flagship incremental)
    "nmf_bounded2",            # NMF multiplicative updates (generator `nmf`)
    "dedup_minhash_pairs",     # MinHash LSH dedup (100 TB path)
    "dedup_cc_clusters",       # near-dup clustering (connected components)
    "ann_bruteforce_topk",     # brute-force ANN baseline
]


def main() -> None:
    from incr_iter_hadoop_spark.registry import all_queries
    from incr_iter_hadoop_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = all_queries()
    # warm the JVM + parquet footers of every table the headline touches, so
    # per-query numbers measure the queries rather than first-read costs
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()

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

    # BASELINE.md protocol item 4: incremental refresh vs full recompute —
    # the reference's raison d'être; the ratio is the regression metric.
    # NOTE at sf0.1 both sides are sub-second and the ratio reflects Spark's
    # fixed per-job overhead (refresh = several small jobs, recompute = one);
    # the asymptotic win — O(affected groups) vs O(state) — appears as state
    # grows past the overhead floor. Track the ratio trend, not its absolute.
    # The incremental scenario starts from ALREADY-MATERIALIZED preserved
    # state (it survives from the prior run), so materialize it first and
    # time only the delta application.
    from pyspark.sql import functions as F

    from incr_iter_hadoop_spark.catalog import load_table
    from incr_iter_hadoop_spark.operators.incremental import preserve, refresh

    # ~1% delta — the reference's UpdatePageRankGraph "change percent" shape:
    # '+' = the held-out 1% of orders, '-' = ~1% of the preserved base
    o_all = load_table(spark, SF_DIR, "orders")
    base = o_all.where(F.col("o_orderkey") % 100 != 0)
    contribs = base.select("o_custkey", "o_orderkey", "o_totalprice").persist()
    state = preserve(
        contribs,
        group_keys=["o_custkey"],
        source_keys=["o_orderkey"],
        agg_exprs={
            "spend": F.sum(F.col("o_totalprice").cast("decimal(27,6)")),
            "n_orders": F.count(F.lit(1)),
            "max_price": F.max("o_totalprice"),
        },
    )
    state.results.persist().count()
    contribs.count()
    delta = (
        o_all.where(F.col("o_orderkey") % 100 == 0)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("op", F.lit("+"))
        .unionByName(
            base.where(F.col("o_orderkey") % 97 == 0)
            .select("o_custkey", "o_orderkey", "o_totalprice")
            .withColumn("op", F.lit("-"))
        )
        .persist()
    )
    delta.count()
    t0 = time.perf_counter()
    refresh(state, delta).results.write.format("noop").mode("overwrite").save()
    refresh_only_sec = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    full = (
        o_all.where(
            (F.col("o_orderkey") % 100 == 0) | (F.col("o_orderkey") % 97 != 0)
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("spend"),
            F.count(F.lit(1)).alias("n_orders"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    full.write.format("noop").mode("overwrite").save()
    full_recompute_sec = round(time.perf_counter() - t0, 3)
    incr_ratio = (
        round(refresh_only_sec / full_recompute_sec, 3)
        if full_recompute_sec
        else None
    )

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "incr_refresh_vs_full_recompute": incr_ratio,
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
