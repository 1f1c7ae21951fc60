"""Query registry: name → (Spark builder, DuckDB oracle SQL).

Every operator from SURVEY.md §2 that the engine claims is registered here
with a Spark DataFrame builder ``fn(spark, sf_dir) -> DataFrame`` and, when
SQL-expressible, an ANSI-SQL oracle string the driver runs on DuckDB against
the same parquet tables. Column aliases MUST match between the two sides;
float aggregates are rounded to 6 decimals on BOTH sides so engine-order
summation noise can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query builder to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .operators import (  # noqa: F401
        aggregates,
        dedup,
        generators,
        incremental,
        iterative,
        joins,
        multimodal,
        pipeline,
        relational,
        sampling,
        setops,
        similarity,
        textops,
        tpch_extra,
        udfs,
        windows,
    )


# ---------------------------------------------------------------------------
# Driver-visible ordering. The correctness driver hash-checks exactly the
# FIRST 50 entries of ``queries()`` in dict order, so the window below is
# curated to put one oracle-checked witness of every operator family
# (SURVEY §2 rows + the LLM-pipeline components) inside positions 0-49.
# Convergence-driven (no_oracle) variants and redundant family twins are
# deliberately registered behind the window — they stay covered by pytest.
#
# ROTATION (round 4): fourteen redundant twins whose families earned green
# driver rows in round 3 (join_override, setop_union, gen_random_kv,
# kmeans_assign, dedup_exact, field_selection, agg_global,
# total_sort_top100, udf_scalar_pandas, secondary_sort_top3,
# projection_inverse_map, wordcount, ann_bruteforce_topk,
# incr_refresh_orders) swapped out for never-driver-checked families —
# every family keeps >= 1 green witness across rounds 3 ∪ 4, and the
# driver's hash reach widens each round at zero coverage loss.
#
# ROTATION (round 5): full swap to the never-driver-checked backlog.
# Every family already holds >= 1 green driver witness across rounds 3 ∪ 4
# (round-4 window was 50/50 green), so all 50 slots rotate to names with no
# CORRECTNESS row in any round: the S6/S7/S9 scans (multi-path, embedded-
# Derby JDBC round-trip, per-iteration snapshot dirs), the REAL multimodal
# decodes (PNG decode + resize, WAV/PCM), substring-span dedup (full +
# incremental) and star-CC, the training-pipeline tail (BM25, packing,
# tokenize-to-ids, shard manifests, token-budget sampling, composed
# training-set build), as-of + null-safe joins, three stateful streaming
# queries, the q2-q22 TPC-H battery, the remaining incremental variants
# (spmv/kmeans/dedup-clusters/minhash-delete), triangle count, IVF ANN,
# lang-ID, unigram logprob, and the two ADVICE-flagged relational queries
# (er_fuzzy_name_pairs, udf_cogrouped_stats). Three slots are reserved for
# round-5 conversions per VERDICT asks #2/#3 — pagerank_converged and
# kmeans_converged (newly EXACT-oracled via the unrolled-with-termination
# CTE pattern) and multimodal_jpeg_decode (new real baseline-JPEG decode).
#
# ROTATION (round 6): the ledger-closing window. Every family already
# holds >= 1 green driver witness across rounds 3 ∪ 4 ∪ 5 (r04 and r05
# were both 50/50 green), so the window rotates to the complete
# never-driver-checked set — 45 names, computed programmatically from the
# registry minus the union of CORRECTNESS_r01..r05 rows: the r4-late
# text/events/sampling tails, the r5 media/dedup/SCD2/streaming/
# quality additions, and the new r6 scd2_store_two_eras. That includes
# embedding_top_pairs (the labeled all-pairs exactness baseline — kept out
# of earlier windows by design, but the ledger-closing goal is every
# registered query driver-verified at least once). The remaining 5 slots:
# the four multimodal plumbing queries REBASED onto real codecs this round
# (multimodal_meta/features/resize/frames — their r03 green rows verified
# the old byte-stat oracles, so the new real-decode semantics need fresh
# driver rows) and incr_refresh_orders_disk as the refreshed I6 witness
# (the disk-refresh ratio is under active observation, VERDICT r5 ask #7).
# After a green round 6: driver-checked union = 179/179 — zero
# verification debt; subsequent rotations only need to re-witness
# families touched by new work.

FIRST_WINDOW: list[str] = [
    # relational / profiling tails (r4-late)
    "profile_orders",
    "skew_report_suppkey",
    "dedup_keep_best",
    "text_regex_tokens",
    "text_repetition_quality",
    "corpus_top_tokens",
    "tfidf_top_terms",
    "inverted_index_trigrams",
    "text_pii_redact",
    "bpe_pair_counts",
    "sample_stratified_events",
    "split_train_test_counts",
    "events_unpivot",
    "array_battery",
    "setop_intersect",
    # embeddings (incl. the labeled all-pairs baseline, window-checked once)
    "embedding_top_pairs",
    "embedding_label_centroids",
    "embedding_dedup_clusters",
    "udf_apply_in_pandas",
    # events / windows / streaming tails
    "events_sliding",
    "events_session",
    "events_running_totals_streamed",
    "events_enriched_streamed",
    "events_funnel",
    "window_battery2",
    "events_resample_gaps",
    "events_stream_stream_join",
    # iterative / incremental tails
    "incr_sssp_warm3",
    "incr_nmf_delta2",
    "graph_kcore_bounded3",
    # SCD2 family (pure transformation, temporal join, on-disk era store)
    "scd2_customer_history",
    "scd2_point_in_time_join",
    "scd2_store_two_eras",
    # r5 real-codec decodes + media ingestion
    "multimodal_adpcm_decode",
    "multimodal_video_frames",
    "multimodal_gif_decode",
    "scan_binaryfile_media",
    "scan_webdataset_shards",
    "scan_csv_roundtrip",
    "scan_orc_roundtrip",
    # media dedup (exact, perceptual, incremental) + capstone
    "media_dedup_exact",
    "media_dedup_phash",
    "incr_media_dedup_phash",
    "pipeline_build_multimodal_set",
    # data-quality gate
    "data_quality_report",
    # REBASED this round onto real codecs — prior green rows verified the
    # retired byte-stat oracles, so the new semantics need fresh rows
    "multimodal_meta",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frames",
    # refreshed I6 witness (disk-refresh ratio under observation)
    "incr_refresh_orders_disk",
]


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    ordered: dict[str, QuerySpec] = {}
    for name in FIRST_WINDOW:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
