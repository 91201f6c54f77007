"""Declared-query roster (SURVEY §2.L) — the correctness contract.

Each module registers queries into ``QUERIES`` (name → callable
``(spark, sf_dir) -> DataFrame``) and, where SQL-expressible, a matching
DuckDB oracle into ``ORACLES``. Registration order follows SURVEY §2's
operator inventory. Importing this package loads the full roster.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def declared(oracle: str | None = None):
    """Register a roster query; ``oracle=None`` marks a rows-only check."""

    def deco(fn):
        QUERIES[fn.__name__] = fn
        if oracle is not None:
            ORACLES[fn.__name__] = oracle
        return fn

    return deco


# Import for side effects: each module registers its queries.
from review_engine_spark.plans import roster_text  # noqa: E402,F401
from review_engine_spark.plans import roster_rel  # noqa: E402,F401
from review_engine_spark.plans import roster_vector  # noqa: E402,F401
from review_engine_spark.plans import roster_rank  # noqa: E402,F401
from review_engine_spark.plans import roster_ext  # noqa: E402,F401
from review_engine_spark.plans import roster_recsys  # noqa: E402,F401
from review_engine_spark.plans import roster_curation  # noqa: E402,F401
from review_engine_spark.plans import roster_tpch  # noqa: E402,F401
from review_engine_spark.plans import roster_retrieval  # noqa: E402,F401
from review_engine_spark.plans import roster_analytics  # noqa: E402,F401
from review_engine_spark.plans import roster_warehouse  # noqa: E402,F401
from review_engine_spark.plans import roster_mining  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-facing ordering. The harness checks only the FIRST 50 oracle
# entries in registration order, so the dicts are re-ordered to put the
# highest-verification-value queries first:
#   tier 1 — reserved for queries whose oracle/plan was FIXED this round
#            (none in r05: the r04 gate was fully green);
#   tier 2 — any oracle-bearing query not yet driver-green: the 42
#            round-4 additions never driver-checked, plus anything newly
#            added or newly oracled this round (falls out of
#            "not in _DRIVER_GREEN");
#   tier 3 — the queries the driver already proved green in r01–r04;
#   tier 4 — rows-only queries (no oracle; bench covers execution).
# ---------------------------------------------------------------------------

_TIER1_FIXED: list[str] = []

#: Union of driver-green rows from CORRECTNESS_r01..r04.json
#: (rows_match & schema_match & hash_match; 178 names). These keep their
#: oracles but yield their first-50 slots to unproven queries.
_DRIVER_GREEN = [
    "q_abtest_ttest", "q_anomaly_zscore", "q_asof_cogroup", "q_asof_join",
    "q_assign_ids", "q_autocorr", "q_bayes_rating", "q_benford",
    "q_bitmap_distinct", "q_bloom_membership", "q_bm25", "q_boilerplate",
    "q_bucketed_join", "q_char_entropy", "q_chi2_independence",
    "q_chunk_docs", "q_clean_text", "q_cohort_retention", "q_contamination",
    "q_cooccur_topk", "q_corrupt_records", "q_cosine_topk", "q_countmin",
    "q_crosstab", "q_csv_roundtrip", "q_cube", "q_cusum", "q_data_profile",
    "q_date_trunc", "q_decontaminate", "q_dedup_apply", "q_dedup_clusters",
    "q_dedup_exact", "q_distinct_count", "q_domain_cap", "q_dot", "q_ewma",
    "q_except", "q_except_all", "q_extract_summary", "q_fingerprint",
    "q_freq_items", "q_full_outer", "q_funnel", "q_fuzzy_pairs",
    "q_gini_udaf", "q_group_collect", "q_group_count", "q_group_percentiles",
    "q_grouping_sets", "q_hard_negatives", "q_histogram", "q_hop_window",
    "q_implicit_ratings", "q_incremental_dedup", "q_intersect",
    "q_intersect_all", "q_inverted_index", "q_join_anti", "q_join_meta",
    "q_json_extract", "q_kmeans", "q_knn_batch", "q_knn_bruteforce",
    "q_ks_test", "q_l2norm", "q_lang_id", "q_lateral_topk",
    "q_length_buckets", "q_map_explode", "q_markov_transitions",
    "q_meanpool", "q_minhash_jaccard", "q_mix_upsample", "q_mixture_apply",
    "q_mixture_weights", "q_near_dup_embedding", "q_negative_sample",
    "q_ngram_jaccard", "q_null_safe_join", "q_observe_metrics",
    "q_orc_roundtrip", "q_pagerank", "q_parse_budget", "q_partitioned_prune",
    "q_percentile_norm", "q_pii_scrub", "q_pivot", "q_pmi_bigrams",
    "q_popularity", "q_price_fit", "q_price_stats", "q_psi_drift",
    "q_python_datasource", "q_quality_gate", "q_quality_score",
    "q_quantize_embeddings", "q_range_join", "q_rank_blend", "q_rate_sample",
    "q_recsys_eval", "q_repetition_stats", "q_resample_ffill", "q_ri_check",
    "q_rollup", "q_salted_collect", "q_salted_join", "q_scan_docs",
    "q_scan_embeddings", "q_schema_evolution", "q_semantic_dedup",
    "q_semi_join", "q_sentence_udtf", "q_sequence_pack", "q_sessionize",
    "q_sessionize_state", "q_simhash_hamming", "q_simhash_md5",
    "q_sink_roundtrip", "q_skew_profile", "q_skipgram_pairs", "q_span_dedup",
    "q_star_join", "q_stats_agg", "q_stratified_sample", "q_stream_dedup",
    "q_stream_ewma", "q_stream_sink_parquet", "q_stream_stream_join",
    "q_stream_tumbling", "q_stream_upsert", "q_text_stats", "q_tfidf",
    "q_token_count_bpe", "q_token_filter", "q_tokenize", "q_top_tokens",
    "q_topk_window", "q_tpch_q1", "q_tpch_q10", "q_tpch_q11", "q_tpch_q12",
    "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16", "q_tpch_q17",
    "q_tpch_q18", "q_tpch_q19", "q_tpch_q2", "q_tpch_q20", "q_tpch_q21",
    "q_tpch_q22", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5", "q_tpch_q6",
    "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_train_split", "q_trend_slope",
    "q_triangle_count", "q_try_arithmetic", "q_ts_window",
    "q_unigram_logprob", "q_union", "q_unpivot", "q_upsert_latest",
    "q_variant_json", "q_wilson_ci", "q_window_analytics", "q_window_lag",
    "q_window_range", "q_window_running", "q_winnow_md5", "q_xml_extract",
    "q_zorder_key",
]


def _driver_order() -> list[str]:
    seen: set[str] = set()
    ordered: list[str] = []

    def take(names):
        for n in names:
            if n in QUERIES and n not in seen:
                seen.add(n)
                ordered.append(n)

    green = set(_DRIVER_GREEN)
    take(_TIER1_FIXED)
    take(n for n in QUERIES if n in ORACLES and n not in green)
    take(n for n in QUERIES if n in ORACLES)
    take(QUERIES)
    return ordered


def _reorder() -> None:
    order = _driver_order()
    q = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(q)
    o = {n: ORACLES[n] for n in order if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o)


_reorder()

__all__ = ["QUERIES", "ORACLES", "declared"]
