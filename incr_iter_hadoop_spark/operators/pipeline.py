"""End-to-end training-corpus cleaning — the flagship composition query.

A real LLM-data pipeline chains the individual operators this package
provides: exact dedup -> near-dup clustering -> quality scoring -> language
filter -> the surviving "clean corpus" manifest. ``pipeline_clean_corpus``
runs that whole chain as ONE declarative DataFrame program (Catalyst sees
the complete plan; filters fuse into the scans), and the DuckDB oracle
replays the identical semantics, so the entire pipeline is hash-checked —
not just its stages in isolation.

Keep rules (all must hold for a doc to survive):
- exact keeper: smallest doc_id of its md5(text) group (dedup.exact_duplicates)
- near-dup keeper: smallest doc_id of its connected component over the
  MinHash-LSH verified jac >= 0.8 pair graph (dedup.minhash_lsh_pairs +
  iterative.connected_components; singletons keep themselves)
- quality >= 0.5 (textops scoring: length + stopword-ratio composite)
- language 'en' (stopword-ratio heuristic >= 0.08)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import ws_tokens
from ..registry import register
from .dedup import _JACCARD_ORACLE
from .textops import _STOPS_SQL, EN_STOPWORDS


_CLEAN_ORACLE = f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_JACCARD_ORACLE}),
    edges AS MATERIALIZED (
      SELECT i AS src, j AS dst FROM pairs
      UNION
      SELECT j AS src, i AS dst FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS lbl FROM documents
      UNION
      SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    clusters AS MATERIALIZED (
      SELECT node AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY node
    ),
    exact_keep AS MATERIALIZED (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    t AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
      FROM documents
    ),
    q AS (
      SELECT doc_id,
             len(w) AS tok_cnt,
             len(list_filter(w, x -> lower(x) IN {_STOPS_SQL}))::DOUBLE
               / len(w) AS stop_ratio,
             LEAST(1.0, len(w) / 100.0) * 0.5
               + len(list_filter(w, x -> lower(x) IN {_STOPS_SQL}))::DOUBLE
                 / len(w) * 0.5 AS quality
      FROM t WHERE len(w) > 0
    )
    SELECT q.doc_id,
           CAST(q.tok_cnt AS BIGINT) AS tok_cnt,
           ROUND(q.quality, 6) AS quality
    FROM q
    JOIN clusters c ON c.doc_id = q.doc_id AND c.cluster = q.doc_id
    JOIN exact_keep ek ON ek.doc_id = q.doc_id
    WHERE q.quality >= 0.5 AND q.stop_ratio >= 0.08
    """


@register(
    "pipeline_clean_corpus",
    oracle=_CLEAN_ORACLE,
    doc="the whole cleaning pipeline as one query: exact-dedup keepers ∩ "
    "near-dup cluster keepers (MinHash-LSH pairs -> frontier-pruned "
    "connected components, keeper = component min) ∩ quality >= 0.5 ∩ "
    "lang='en' -> clean-corpus manifest (doc_id, tok_cnt, quality). "
    "Hash-checked end to end against a recursive-CTE + md5-group oracle.",
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import exact_duplicates, minhash_lsh_pairs
    from .iterative import connected_components

    d = load_table(spark, sf_dir, "documents")
    # near-dup keepers: CC over verified pair graph, keeper = component min
    pairs = minhash_lsh_pairs(d, "doc_id", "text")
    cc = connected_components(
        pairs.select(F.col("i").alias("src"), F.col("j").alias("dst")),
        nodes=d.select(F.col("doc_id").alias("node")),
    )
    near_keepers = cc.state.where(F.col("node") == F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    # exact keepers (covers the sub-3-token docs the shingle graph misses)
    exact_keepers = exact_duplicates(d, "doc_id", "text").select(
        F.col("keeper").alias("doc_id")
    )
    # quality + language scoring (textops semantics, inlined so the filter
    # sits in the same plan as the scans)
    w = ws_tokens(F.col("text"))
    scored = d.select("doc_id", w.alias("w")).where(F.size("w") > 0)
    tok_cnt = F.size("w")
    stops = F.size(F.filter(F.col("w"), lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    stop_ratio = stops.cast("double") / tok_cnt
    quality = F.least(F.lit(1.0), tok_cnt / 100.0) * 0.5 + stop_ratio * 0.5
    scored = scored.select(
        "doc_id",
        tok_cnt.cast("bigint").alias("tok_cnt"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality_raw"),
    )
    return (
        scored.join(near_keepers, "doc_id", "left_semi")
        .join(exact_keepers, "doc_id", "left_semi")
        .where((F.col("quality_raw") >= 0.5) & (F.col("stop_ratio") >= 0.08))
        .select("doc_id", "tok_cnt", F.round("quality_raw", 6).alias("quality"))
    )


_DECON_N = 5        # shingle width for overlap detection (rare n-grams)
_DECON_FRAC = 0.05  # benchmark split fraction (hash-gated, deterministic)


@register(
    "decontaminate_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w,
             substring(md5('bench|' || CAST(doc_id AS VARCHAR)), 1, 4)
               < '0ccd' AS is_bench
      FROM documents
    ), sh AS (
      SELECT doc_id, is_bench,
             unnest(list_distinct(
               [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                     || ' ' || w[i+4]
                for i in range(1, len(w) - 3)])) AS s
      FROM t WHERE len(w) >= {_DECON_N}
    ), df AS (
      SELECT s, COUNT(*) AS n_docs FROM sh GROUP BY s
    ), rare AS (
      SELECT sh.doc_id, sh.is_bench, sh.s
      FROM sh JOIN df ON df.s = sh.s WHERE df.n_docs <= 50
    )
    SELECT a.doc_id,
           CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs,
           CAST(COUNT(DISTINCT a.s) AS BIGINT) AS n_shared_shingles
    FROM rare a JOIN rare b ON a.s = b.s
    WHERE NOT a.is_bench AND b.is_bench
    GROUP BY a.doc_id
    """,
    doc="decontamination sweep: training docs sharing any rare 5-gram with "
    "the (hash-gated 5%) benchmark split are flagged with how many "
    "benchmark docs and distinct shingles they collide with — the "
    "GPT-style n-gram-overlap test-set leak check, as one inverted-index "
    "equi-join (df-capped like the ngram dedup, so a boilerplate shingle "
    "can't go quadratic at corpus scale).",
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import NGRAM_MAX_DF, shingle_sets
    from .sampling import hash_gate

    d = load_table(spark, sf_dir, "documents")
    sets = shingle_sets(d, "doc_id", "text", n=_DECON_N)
    gated = sets.withColumn(
        "is_bench", hash_gate(F.col("id"), _DECON_FRAC, seed="bench")
    )
    inv = gated.select("id", "is_bench", F.explode("shingles").alias("s"))
    docfreq = inv.groupBy("s").agg(F.count(F.lit(1)).alias("n_docs"))
    rare = inv.join(docfreq.where(F.col("n_docs") <= NGRAM_MAX_DF), "s")
    train = rare.where(~F.col("is_bench")).select(
        F.col("id").alias("doc_id"), "s"
    )
    bench = rare.where(F.col("is_bench")).select(
        F.col("id").alias("bench_id"), "s"
    )
    return (
        train.join(bench, "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").alias("n_bench_docs"),
            F.countDistinct("s").alias("n_shared_shingles"),
        )
    )


from .sampling import fingerprint_hash, fingerprint_hash_sql

_PACK_LEN = 512  # tokens per packed training example
_PACK_STREAMS = 8  # parallel packing streams


@register(
    "pipeline_build_training_set",
    oracle=f"""
    WITH clean AS ({_CLEAN_ORACLE}),
    t AS (
      SELECT doc_id, tok_cnt,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               % {_PACK_STREAMS} AS stream,
             md5(CAST(doc_id AS VARCHAR)) AS okey,
             {fingerprint_hash_sql('doc_id')} AS fp
      FROM clean
    ), c AS (
      SELECT stream, doc_id, tok_cnt, fp,
             SUM(tok_cnt) OVER (PARTITION BY stream ORDER BY okey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok_cnt
               AS start_off
      FROM t
    )
    SELECT stream,
           CAST(start_off // {_PACK_LEN} AS BIGINT) AS example_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok_cnt) AS BIGINT) AS n_tokens,
           CAST(SUM(fp) AS BIGINT) AS manifest_fp
    FROM c GROUP BY 1, 2
    """,
    doc="the END-TO-END training-set build as one declarative plan: the "
    "full cleaning pipeline (exact + near-dup keepers ∩ quality ∩ lang) "
    "feeds deterministic sharding (md5 mod 8 streams), md5-ordered "
    f"concat-and-split packing into {_PACK_LEN}-token examples, and an "
    "order-independent combinable manifest fingerprint — what a user "
    "runs to turn a raw corpus into audited training shards. Catalyst "
    "sees the whole pipeline as one plan (keeper semi-joins fuse into "
    "the scans); every stage reuses the exact operator the standalone "
    "queries check, so the composition is hash-checked end to end.",
)
def pipeline_build_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .sampling import shard_assignment

    clean = pipeline_clean_corpus(spark, sf_dir)
    t = clean.select(
        "doc_id",
        "tok_cnt",
        shard_assignment(F.col("doc_id"), _PACK_STREAMS).alias("stream"),
        F.md5(F.col("doc_id").cast("string")).alias("okey"),
        fingerprint_hash(F.col("doc_id")).alias("fp"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("start_off", F.sum("tok_cnt").over(w) - F.col("tok_cnt"))
    return c.groupBy(
        "stream", F.floor(F.col("start_off") / _PACK_LEN).alias("example_id")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok_cnt").cast("bigint").alias("n_tokens"),
        F.sum("fp").cast("bigint").alias("manifest_fp"),
    )


from .sampling import _QBL_ORACLE, _split3_values_sql
from .similarity import _SEMDEDUP_ORACLE

_CURATED_SPLIT_ORACLE = f"""
    WITH qual AS MATERIALIZED ({_QBL_ORACLE}),
    sem AS MATERIALIZED ({_SEMDEDUP_ORACLE}),
    surv AS (
      SELECT q.doc_id, d.source, q.lang, q.bucket
      FROM qual q
      JOIN sem s ON s.vec_id = q.doc_id AND s.kept
      JOIN documents d ON d.doc_id = q.doc_id
    ),
    {_split3_values_sql()},
    r AS (
      SELECT doc_id, source, lang, bucket,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('cursplit|' || CAST(doc_id AS VARCHAR))
             ) AS rk
      FROM surv
    )
    SELECT r.doc_id, r.source, r.lang, r.bucket, CAST(r.rk AS BIGINT) AS rk,
           CASE WHEN r.rk <= q.n_test THEN 'test'
                WHEN r.rk <= q.n_test + q.n_val THEN 'val'
                ELSE 'train' END AS split
    FROM r JOIN q USING (source)
"""


@register(
    "pipeline_curated_split",
    oracle=_CURATED_SPLIT_ORACLE,
    doc="round-13 curation capstone: the three r13 operators composed as "
    "ONE declarative plan — per-language CCNet quality buckets (head + "
    "hash-gated middle/tail) ∩ SemDeDup survivors (cluster-then-prune "
    "keep flags on the aligned embedding table), then the EXACT "
    "per-source train/val/test split over the curated survivors (two-"
    "level stratified rank, broadcast quota map, seed 'cursplit' so the "
    "ranks are independent of the standalone split query). Each stage "
    "is the exact operator its standalone query hash-checks; the oracle "
    "nests those oracles verbatim (DuckDB nested-WITH subqueries) and "
    "recomputes the split rank over the survivor set, so the whole "
    "composition is hash-checked end to end. Scale shape inherits the "
    "components': broadcast thresholds/centroids/quotas, cell-bounded "
    "pair join, no whole-stratum window.",
)
def pipeline_curated_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sampling import (
        _SPLIT3_QUOTAS,
        sample_exact_split,
        sample_quality_buckets_by_lang,
    )
    from .similarity import semantic_dedup_query

    qual = sample_quality_buckets_by_lang(spark, sf_dir).select(
        "doc_id", "lang", "bucket"
    )
    sem = (
        semantic_dedup_query(spark, sf_dir)
        .where(F.col("kept"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    surv = qual.join(sem, "doc_id").join(d, "doc_id")
    out = sample_exact_split(
        surv, "source", "doc_id", _SPLIT3_QUOTAS, seed="cursplit"
    )
    return out.select("doc_id", "source", "lang", "bucket", "rk", "split")
