"""Generator-driven scale-stress bench (round 5, VERDICT #4).

The sf0.1 fixtures top out at ~17 MB, so the 100×-scale claims otherwise
rest on plan-shape arguments alone. This harness synthesizes workloads
10–50× the sf0.1 operating point ON THE EXECUTORS (spark.range → column
exprs; no driver-side data, no fixture files) for three representatives
and measures how their costs actually scale:

1. **PageRank per-iteration cost** — ``gen_graph_edges`` at ~0.6M edges
   (the sf0.1 graph size) and ~50× that; 5 bounded iterations each; the
   scaling metric is seconds per iteration per million edges. Linear ⇒
   the one-shuffle-per-iteration plan holds.
2. **MinHash+LSH dedup** — synthetic corpora (LCG token soup, 1% injected
   near-dup neighbors so output size stays LINEAR in corpus size — pure
   replication would create quadratic-output clusters and measure output
   materialization, not the operator) at 5k and 50× docs; metric:
   seconds per 1k docs, plus found-pair counts proving the injected dups
   are recovered at both scales.
3. **Disk-store refresh ratio vs state size** — the bench.py steady-state
   protocol at 150× and 450× replicated contributions. The incremental
   thesis predicts the refresh:recompute RATIO falls as state grows
   (refresh cost tracks the delta, recompute tracks the state).

Usage: python bench/stress.py  [--quick]
Prints one JSON line; appends it to bench/results/stress-<date>.json and
regenerates bench/results/STRESS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import date, datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
QUICK = "--quick" in sys.argv


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("spark-graft-stress")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    out: dict = {
        "metric": "stress_scaling",
        "unit": "sec",
        "ts": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "cpus": int(CPUS),
    }

    # ---- 1. PageRank per-iteration scaling ------------------------------
    from incr_iter_hadoop_spark.operators.generators import gen_graph_edges
    from incr_iter_hadoop_spark.operators.iterative import pagerank

    def time_pagerank(n_nodes: int, iters: int = 5):
        edges = gen_graph_edges(spark, n_nodes, avg_degree=8)
        n_edges = edges.count()
        t0 = time.perf_counter()
        res = pagerank(edges, max_iterations=iters)
        res.state.count()
        wall = time.perf_counter() - t0
        res.state.unpersist()
        return n_edges, round(wall, 2), round(wall / iters / (n_edges / 1e6), 3)

    small_nodes = 150_000  # ≈ the sf0.1 graph's 0.59M edges
    big_nodes = small_nodes * (10 if QUICK else 50)
    e1, w1, c1 = time_pagerank(small_nodes)
    e2, w2, c2 = time_pagerank(big_nodes)
    out["pagerank"] = {
        "edges_small": e1, "wall_small_sec": w1, "sec_per_iter_per_Medges_small": c1,
        "edges_big": e2, "wall_big_sec": w2, "sec_per_iter_per_Medges_big": c2,
        # < 1 means the big run is CHEAPER per edge (fixed overhead
        # amortized); > 1 means super-linear growth
        "scaling_ratio": round(c2 / c1, 3) if c1 else None,
    }

    # ---- 2. MinHash+LSH dedup scaling -----------------------------------
    from incr_iter_hadoop_spark.operators.dedup import minhash_lsh_pairs

    def synth_docs(n_docs: int):
        """LCG token soup, 40 tokens/doc over a 50k-token vocab: accidental
        near-dups are vanishingly rare, so pair output is driven by the
        INJECTED dups — every doc with id % 100 == 0 gets a neighbor
        (id+1) sharing all but two tokens."""
        base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        # md5-hashed tokens: a LINEAR formula (d·a + j·b mod V) makes every
        # doc an arithmetic progression — docs become shifted copies of
        # each other and everything near-dups everything (observed: 3.4k
        # accidental pairs at 5k docs). Hashing (base_id, j) kills the
        # additive structure; accidental 3-shingle overlap is then ~0.
        base_id = (
            F.col("doc_id") - (F.col("doc_id") % 100 == 1).cast("long")
        )
        tok = F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda j: F.concat(
                F.lit("t"),
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("_", base_id, j)), 1, 7
                    ),
                    16,
                    10,
                )
                % 50_000,
            ),
        )
        # docs with id%100==1 reuse id-1's tokens (via base_id), then
        # mutate two positions -> a guaranteed near-dup pair per 100 docs
        # (3-shingle Jaccard 36/40 = 0.9 > the 0.8 threshold)
        mutated = F.when(
            F.col("doc_id") % 100 == 1,
            F.concat(
                F.slice(tok, 1, 38),
                F.array(
                    F.concat(F.lit("x"), F.col("doc_id")),
                    F.concat(F.lit("y"), F.col("doc_id")),
                ),
            ),
        ).otherwise(tok)
        return base.select(
            "doc_id", F.array_join(mutated, " ").alias("text")
        )

    def time_minhash(n_docs: int):
        docs = synth_docs(n_docs).persist()
        docs.count()
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(docs, "doc_id", "text")
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0
        docs.unpersist()
        return n_pairs, round(wall, 2), round(wall / (n_docs / 1e3), 3)

    small_docs = 5_000
    big_docs = small_docs * (10 if QUICK else 50)
    p1, mw1, mc1 = time_minhash(small_docs)
    p2, mw2, mc2 = time_minhash(big_docs)
    out["minhash"] = {
        "docs_small": small_docs, "pairs_small": p1, "wall_small_sec": mw1,
        "sec_per_kdocs_small": mc1,
        "docs_big": big_docs, "pairs_big": p2, "wall_big_sec": mw2,
        "sec_per_kdocs_big": mc2,
        "scaling_ratio": round(mc2 / mc1, 3) if mc1 else None,
    }

    # ---- 3. Disk-store refresh ratio vs state size ----------------------
    from incr_iter_hadoop_spark.catalog import load_table
    from incr_iter_hadoop_spark.sources.preserve_store import PreserveStore

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    o_all = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .persist()
    )
    o_all.count()

    def disk_ratio(n_copies: int):
        """bench.py's steady-state disk protocol at a parameterized state
        size (150× is the headline scenario; bigger = the thesis test)."""
        rep = spark.range(n_copies).select(F.col("id").alias("_copy"))
        big = o_all.crossJoin(rep).select(
            "o_custkey",
            (F.col("o_orderkey") + F.col("_copy") * 10_000_000_000).alias(
                "o_orderkey"
            ),
            "o_totalprice",
        )
        root = tempfile.mkdtemp(prefix="stress_preserve_")
        store = PreserveStore(spark, os.path.join(root, "orders"))
        t0 = time.perf_counter()
        store.initialize(
            big,
            group_keys=["o_custkey"],
            source_keys=["o_orderkey"],
            agg_sql={
                "spend": "CAST(SUM(o_totalprice) AS DOUBLE)",
                "n_orders": "CAST(COUNT(1) AS BIGINT)",
            },
            num_buckets=64,
        )
        init_sec = round(time.perf_counter() - t0, 2)

        def mk_delta(mod, add_off, rm_copy):
            aff = F.col("o_custkey") % mod == 0
            additions = (
                o_all.where(aff)
                .select(
                    "o_custkey",
                    (F.col("o_orderkey") + F.lit(add_off)).alias("o_orderkey"),
                    "o_totalprice",
                )
                .withColumn("op", F.lit("+"))
            )
            removals = (
                o_all.where(aff)
                .select(
                    "o_custkey",
                    (F.col("o_orderkey") + F.lit(rm_copy * 10_000_000_000)).alias(
                        "o_orderkey"
                    ),
                    "o_totalprice",
                )
                .withColumn("op", F.lit("-"))
            )
            return additions.unionByName(removals).persist()

        warmup = mk_delta(1871, 2_000_000_000_000, 5)
        warmup.count()
        store.refresh(warmup)
        timed = [
            mk_delta(1873 + 2 * k, (3 + k) * 1_000_000_000_000, 7 + k)
            for k in range(3)
        ]
        runs = []
        for d in timed:
            d.count()
            t0 = time.perf_counter()
            store.refresh(d)
            runs.append(round(time.perf_counter() - t0, 3))
        refresh_sec = sorted(runs)[1]
        base_contribs = spark.table(store._table_name("contribs"))
        both = warmup
        for d in timed:
            both = both.unionByName(d)
        t0 = time.perf_counter()
        minus_d = both.where(F.col("op") == "-").select("o_custkey", "o_orderkey")
        plus_d = both.where(F.col("op") == "+").drop("op")
        (
            base_contribs.join(minus_d, ["o_custkey", "o_orderkey"], "left_anti")
            .unionByName(plus_d)
            .groupBy("o_custkey")
            .agg(
                F.expr("CAST(SUM(o_totalprice) AS DOUBLE)").alias("spend"),
                F.expr("CAST(COUNT(1) AS BIGINT)").alias("n_orders"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(root, "full_out"))
        )
        full_sec = round(time.perf_counter() - t0, 3)
        shutil.rmtree(root, ignore_errors=True)
        return {
            "n_copies": n_copies,
            "init_sec": init_sec,
            "refresh_runs": runs,
            "refresh_sec": refresh_sec,
            "full_recompute_sec": full_sec,
            "ratio": round(refresh_sec / full_sec, 3) if full_sec else None,
        }

    scales = [150, 300] if QUICK else [150, 450]
    out["disk_refresh"] = [disk_ratio(c) for c in scales]
    o_all.unpersist()

    line = json.dumps(out)
    print(line)
    results_dir = os.path.join(REPO, "bench", "results")
    os.makedirs(results_dir, exist_ok=True)
    path = os.path.join(results_dir, f"stress-{date.today().isoformat()}.json")
    with open(path, "a") as fh:
        fh.write(line + "\n")
    _write_stress_md(results_dir)


def _write_stress_md(results_dir: str) -> None:
    rows = []
    for fn in sorted(os.listdir(results_dir)):
        if fn.startswith("stress-") and fn.endswith(".json"):
            with open(os.path.join(results_dir, fn)) as fh:
                rows += [json.loads(ln) for ln in fh if ln.strip()]
    lines = [
        "# Scale-stress results (synthetic 10-50x workloads; see bench/stress.py)",
        "",
        "| run | pagerank s/iter/Medges 1x -> Nx (ratio) | minhash s/kdocs"
        " 1x -> Nx (ratio) | disk ratio by state copies |",
        "|---|---|---|---|",
    ]
    for r in rows:
        pg, mh = r.get("pagerank", {}), r.get("minhash", {})
        disks = ", ".join(
            f"{d['n_copies']}x:{d['ratio']}" for d in r.get("disk_refresh", [])
        )
        lines.append(
            f"| {r.get('ts', '?')} | {pg.get('sec_per_iter_per_Medges_small')}"
            f" -> {pg.get('sec_per_iter_per_Medges_big')}"
            f" ({pg.get('scaling_ratio')}) | {mh.get('sec_per_kdocs_small')}"
            f" -> {mh.get('sec_per_kdocs_big')} ({mh.get('scaling_ratio')})"
            f" | {disks} |"
        )
    with open(os.path.join(results_dir, "STRESS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
