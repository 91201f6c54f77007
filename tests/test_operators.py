"""Operator-level tests: MMR golden behavior, dedup families, similarity,
plan-shape invariants (SURVEY §5.2.4, §4.3.3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from review_engine_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from review_engine_spark.operators.ranking import mmr_diversify, top_k_by
from review_engine_spark.operators.similarity import brute_force_topk, ivf_topk


def test_mmr_first_pick_is_pure_relevance(spark):
    # Two near-identical top docs: MMR must pick the best, then skip its
    # twin in favor of the diverse third (rank.py:282-325 semantics).
    rows = [
        (1, 1.00, [1.0, 0.0]),
        (2, 0.99, [1.0, 0.0]),   # duplicate direction of 1
        (3, 0.50, [0.0, 1.0]),   # orthogonal
    ]
    df = spark.createDataFrame(rows, "id long, rel double, vec array<double>")
    out = mmr_diversify(spark, df, "id", "rel", "vec", k=2).collect()
    assert [r["id"] for r in out] == [1, 3]
    assert [r["mmr_rank"] for r in out] == [1, 2]


def test_mmr_none_vector_tolerated(spark):
    rows = [(1, 1.0, [1.0, 0.0]), (2, 0.9, None), (3, 0.8, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "id long, rel double, vec array<double>")
    out = mmr_diversify(spark, df, "id", "rel", "vec", k=3).collect()
    # None vector → similarity 0.0 (rank.py:195-197), so id=2 ranks 2nd
    assert [r["id"] for r in out] == [1, 2, 3]


def test_mmr_ties_keep_first_seen(spark):
    rows = [(7, 0.5, [1.0, 0.0]), (3, 0.5, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, rel double, vec array<double>")
    out = mmr_diversify(spark, df, "id", "rel", "vec", k=1).collect()
    # candidate order is (-score, id): id=3 first on equal scores
    assert out[0]["id"] == 3


def test_exact_dedup_survivor_is_min_id(spark):
    rows = [(10, "Same  Text"), (3, "same text"), (5, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_dups"] for r in exact_dedup(df, "text", "doc_id").collect()}
    assert out == {3: 2, 5: 1}


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely different words describing an unrelated topic entirely here now"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {
        (r["left_id"], r["right_id"])
        for r in minhash_lsh_pairs(df, "text", "doc_id", min_jaccard=0.3).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_near_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"
    far = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    # short docs have noisy bits (each bit's vote sum is near zero), so the
    # one-token edit lands at hamming ≈ 10 — recall threshold 16 catches it
    # while the unrelated doc (hamming ≈ 31) must stay excluded
    pairs = {
        (r["left_id"], r["right_id"])
        for r in simhash_near_dups(df, "text", "doc_id", max_hamming=16).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_exact_value(spark):
    # identical docs → jaccard 1.0
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    out = ngram_jaccard_pairs(df, "text", "doc_id").collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0


def test_brute_force_topk_self_excluded(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = brute_force_topk(emb, queries, k=5).collect()
    assert len(out) == 10
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rn"] <= 5


def test_ivf_recall_against_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=6).collect()
    }
    # probing 6/8 cells should recover a decent fraction of the exact set
    assert len(exact & approx) >= len(exact) // 2


def test_topk_plan_uses_take_ordered(spark, sf_dir):
    """E1/F1 physical invariant: global top-k compiles to
    TakeOrderedAndProject, not a full sort (SURVEY §4.1)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    plan = (
        top_k_by(part, "p_retailprice", "p_partkey", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_scan_pushdown(spark, sf_dir):
    """A1 physical invariant: projection prunes ReadSchema and the filter
    reaches the parquet scan as a pushed filter."""
    from review_engine_spark.plans.roster_text import q_scan_docs

    df = q_scan_docs(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,200)" in plan
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_rerank_stub_called_after_topk_cut(spark, sf_dir):
    """§4.3.3 invariant: the rerank UDF runs on ≤200 rows — the limit sits
    below the UDF in the plan, so the Python worker sees only the cut."""
    from review_engine_spark.plans.roster_ext import q_rerank_stub

    out = q_rerank_stub(spark, sf_dir)
    assert out.count() <= 200
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the limit must appear below (after, in printed order) the Python eval
    assert "TakeOrderedAndProject" in plan
