"""Roster-level smoke + light golden checks at sf0.001 (the full
DuckDB-oracle comparison runs via tools/check.py and the driver)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # every §2.L deterministic query has an oracle
    for name in [
        "q_scan_docs", "q_clean_text", "q_token_filter", "q_join_meta",
        "q_join_anti", "q_group_collect", "q_group_count", "q_meanpool",
        "q_price_stats", "q_percentile_norm", "q_distinct_count", "q_rollup",
        "q_topk_window", "q_window_lag", "q_window_running", "q_cosine_topk",
        "q_union", "q_intersect", "q_except", "q_parse_budget",
        "q_extract_summary", "q_tokenize", "q_price_fit", "q_bayes_rating",
        "q_popularity", "q_rank_blend", "q_dot", "q_l2norm", "q_json_extract",
        "q_date_trunc", "q_ts_window", "q_dedup_exact", "q_knn_bruteforce",
        "q_text_stats",
    ]:
        assert name in oracles, name


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    # F2 invariant: priced rows strictly before unpriced
    missing_flags = [r["price_missing"] for r in rows]
    assert missing_flags == sorted(missing_flags)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_at_sf0001(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() >= 0
