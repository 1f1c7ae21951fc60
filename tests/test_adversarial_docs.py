"""Oracle parity on ADVERSARIAL inputs — degenerate documents (empty,
whitespace-only, 1-token, 2-token, heavily repeated, unicode) and
embeddings (zero vector, identical vectors).

The sf* corpora are benign: every doc has plenty of tokens, so a
Spark-vs-oracle divergence that only triggers on short docs (inner-join
drops vs unconditional rows, negative-length slice, descending sequence(),
zero-norm division) passes the standard gate silently. This suite pins the
whole class: every documents-/embeddings-only query must match its oracle
on inputs built to hit the edges. (Bug class found in review: 0/1-token
docs diverged in text_repetition_quality and inverted_index_trigrams.)
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from incr_iter_hadoop_spark.registry import all_queries

from test_oracle_parity import assert_frames_match

# r14 (VERDICT r13 ask #6): stress/property suite excluded from the
# default run so the driver's verify window completes; run everything
# with  pytest -m "slow or not slow"  (see pytest.ini).
pytestmark = pytest.mark.slow


# queries whose Spark side and oracle read ONLY the documents table
DOC_QUERIES = [
    "text_token_stats",
    "text_repetition_stats",
    "text_dup_line_stats",
    "text_gopher_filter",
    "text_quality",
    "text_lang_id",
    "text_regex_tokens",
    "doc_fingerprint",
    "text_chunk_windows",
    "text_repetition_quality",
    "corpus_top_tokens",
    "tfidf_top_terms",
    "inverted_index_trigrams",
    "text_pii_redact",
    "text_unigram_logprob",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_pairs",
    "dedup_cc_clusters",
    "dedup_cc_star",
    "dedup_substring_spans",
    "dedup_keep_best",
    "shard_manifest",
    "bpe_pair_counts",
    "tokenize_to_ids",
    "pack_sequences",
    "incr_dedup_substring",
    "scan_jsonl_roundtrip",
    "bm25_scores",
    "incr_dedup_minhash_delete",
    "incr_dedup_minhash_pairs",
    "sample_documents_10pct",
    "sample_token_budget",
    "sample_mixture_epochs",
    "sample_mixture_temperature",
    "sample_quality_buckets",
    "sample_quality_buckets_by_lang",
    "sample_exact_quota",
    "sample_exact_split_3way",
    "text_classifier_filter",
    "pipeline_clean_corpus",
    "pipeline_build_training_set",
    "decontaminate_overlap",
    "decontaminate_substring",
    "decontaminate_normalized",
    "incr_decontaminate_normalized",
    "decontaminate_normalized_streamed",
    "decontaminate_streamed",
    "incr_decontaminate",
    "dedup_paragraphs_global",
    "dedup_paragraphs_fp",
    "incr_dedup_paragraphs",
    "incr_dedup_paragraphs_fp",
    "agg_histogram",
    "wordcount",
    "incr_dedup_clusters",
    "multimodal_meta",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frames",
    "multimodal_png_decode",
    "multimodal_png_resize",
    "multimodal_wav_decode",
    "multimodal_jpeg_decode",
    "multimodal_adpcm_decode",
    "multimodal_video_frames",
    "scan_binaryfile_media",
    "multimodal_gif_decode",
    "media_dedup_exact",
    "media_dedup_phash",
    "incr_media_dedup_phash",
    "scan_webdataset_shards",
    "scan_csv_roundtrip",
    "pipeline_build_multimodal_set",
]

# queries whose Spark side and oracle read ONLY the embeddings table
EMB_QUERIES = [
    "embedding_top_pairs_lsh",
    "embedding_dedup_clusters",
    "embedding_label_centroids",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_top_pairs",
    "array_battery",
    "kmeans_assign",
    "kmeans_bounded2",
    "incr_kmeans_delta2",
    "kmeans_converged",
    "semantic_dedup_prune",
    "incr_semantic_dedup",
    "sample_cluster_balanced",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_corpus")
    texts = [
        "",  # empty
        "   ",  # whitespace-only
        "solo",  # 1 token: no bigrams/trigrams
        "two tokens",  # 2 tokens: bigram but no trigram
        "the the the the the the the the",  # max repetition
        "héllo wörld héllo wörld naïve café",  # non-ASCII
        "a b a b a b a b a b a b a b a b a b",  # near-dup template A
        "a b a b a b a b a b a b a b a b c d",  # near-dup template B
        "the quick brown fox jumps over the lazy dog and runs away fast",
        "an entirely different document with its own unique vocabulary set",
        "numbers 123 456 and punctuation ! ? . , mixed into the stream",
        "the quick brown fox jumps over the lazy dog and runs away fast",
        # hostile NON-SPACE whitespace (r11, ADVICE r10): ws_tokens splits
        # on ' ' only, so tabs/NBSP/U+2028 survive inside "tokens" — any
        # query treating whitespace asymmetrically across engines breaks
        # here (the paragraph family normalized (?U)\s for exactly this)
        "tab\tseparated\ttokens and spaced words too",
        "\t\t\t",  # all-tab: blank under (?U)\S, three "tokens" if split on \t
        "nbsp joined and line separated words here now",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"src{i % 3}" for i in range(len(texts))],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    docs.to_parquet(d / "documents.parquet")
    dim = 64
    rng = [
        [0.0] * dim,  # zero vector: cosine must not divide by zero
        [1.0] * dim,
        [1.0] * dim,  # exact duplicate of vec 1
        [(-1.0) ** i for i in range(dim)],
        [float(i) / dim for i in range(dim)],
        [1.0] + [0.0] * (dim - 1),
    ]
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(len(rng), dtype=np.int64),
            "embedding": [np.array(v, dtype=np.float32) for v in rng],
            "label": np.array([i % 2 for i in range(len(rng))], dtype=np.int64),
        }
    )
    emb.to_parquet(d / "embeddings.parquet")
    return str(d)


def _ddb_for(adv_dir: str, table: str):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW {table} AS "
        f"SELECT * FROM read_parquet('{adv_dir}/{table}.parquet')"
    )
    return con


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_adversarial_documents_parity(name, spark, adv_dir):
    spec = all_queries()[name]
    spark_pdf = spec.fn(spark, adv_dir).toPandas()
    con = _ddb_for(adv_dir, "documents")
    try:
        oracle_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, f"adv:{name}")


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_adversarial_embeddings_parity(name, spark, adv_dir):
    spec = all_queries()[name]
    spark_pdf = spec.fn(spark, adv_dir).toPandas()
    con = _ddb_for(adv_dir, "embeddings")
    try:
        oracle_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, f"adv:{name}")


# batch queries whose Spark side and oracle read ONLY the events table
EVENT_QUERIES = [
    "events_tumbling",
    "events_pivot",
    "events_unpivot",
    "events_sliding",
    "events_session",
    "events_funnel",
    "sample_stratified_events",
    "events_resample_gaps",
    "json_extract",
    "join_null_safe",
    "join_asof",
    "agg_approx_distinct_bounded",
    "jdbc_count_verify",
]


@pytest.fixture(scope="module")
def adv_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_events")
    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta
    rows = [
        # (event_id, ts_offset, user_id, event_type, value, props)
        (0, m("0s"), 1, "view", 1.0, '{"k": 1}'),
        # duplicate timestamp, different events/users (tie-break stress)
        (1, m("0s"), 1, "click", 2.0, '{"k": 2}'),
        (2, m("0s"), 2, "view", 3.0, '{}'),
        # exactly on a 5-minute tumbling boundary
        (3, m("300s"), 1, "view", 4.0, '{"k": 3}'),
        # exactly a 10-minute gap after event 3 (session boundary edge)
        (4, m("900s"), 1, "purchase", 5.0, '{"k": 4}'),
        # one microsecond inside / outside the gap
        (5, m("1499999999us"), 1, "view", 6.0, '{"k": 5}'),
        (6, m("2100s"), 2, "signup", 0.0, '{"k": 0}'),
        # same user, same ts, different types (funnel steps simultaneous)
        (7, m("2100s"), 2, "purchase", -7.5, '{"k": -1}'),
        (8, m("3000s"), 3, "view", 8.0, '{"nested": {"k": 9}}'),
        (9, m("3600s"), 3, "purchase", 9.0, '{"k": 10}'),
        # out-of-order event_id vs ts
        (10, m("1800s"), 3, "click", 10.0, '{"k": 11}'),
        (11, m("7200s"), 4, "error", 11.0, '{"k": 12}'),
    ]
    ev = pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], dtype=np.int64),
            "ts": [base + r[1] for r in rows],
            "user_id": np.array([r[2] for r in rows], dtype=np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.array([r[4] for r in rows], dtype=np.float64),
            "props": [r[5] for r in rows],
        }
    )
    ev.to_parquet(d / "events.parquet")
    # minimal customer dim for the stream-static enrich: users 3 and 4 have
    # NO customer row (inner join must drop them identically), custkey 5
    # matches no events
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 5], dtype=np.int64),
            "c_name": ["Customer#1", "Customer#2", "Customer#5"],
            "c_nationkey": np.array([0, 0, 1], dtype=np.int32),
            "c_acctbal": np.array([0.0, -5.0, 9.9]),
            "c_mktsegment": ["BUILDING", "BUILDING", "MACHINERY"],
        }
    )
    cust.to_parquet(d / "customer.parquet")
    return str(d)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_adversarial_events_parity(name, spark, adv_events_dir):
    spec = all_queries()[name]
    spark_pdf = spec.fn(spark, adv_events_dir).toPandas()
    con = _ddb_for(adv_events_dir, "events")
    try:
        oracle_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, f"adv:{name}")


# streaming queries that read ONLY events.parquet from the sf_dir — run the
# REAL micro-batch pipelines over the tie-heavy fixture (duplicate rows with
# identical timestamps are exactly what watermark dedup state must collapse)
STREAMING_EVENT_QUERIES = [
    "events_tumbling_streamed",
    "events_session_streamed",
    "events_running_totals_streamed",
    "streaming_dedup_events",
    "events_stream_stream_join",
]


def test_adversarial_enriched_stream_parity(spark, adv_events_dir):
    """Stream-static enrich on the tie-heavy events with a partial dim:
    events whose user has no customer row must drop on both sides."""
    spec = all_queries()["events_enriched_streamed"]
    spark_pdf = spec.fn(spark, adv_events_dir).toPandas()
    con = duckdb.connect()
    try:
        for t in ("events", "customer"):
            con.sql(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{adv_events_dir}/{t}.parquet')"
            )
        oracle_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, "adv:events_enriched_streamed")


@pytest.mark.parametrize("name", STREAMING_EVENT_QUERIES)
def test_adversarial_events_streaming_parity(name, spark, adv_events_dir):
    spec = all_queries()[name]
    spark_pdf = spec.fn(spark, adv_events_dir).toPandas()
    con = _ddb_for(adv_events_dir, "events")
    try:
        oracle_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, f"adv:{name}")
