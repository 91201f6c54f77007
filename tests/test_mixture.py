"""Mixture planning + deterministic upsampled training order."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from review_engine_spark.operators.mixture import mixture_plan, upsample_epochs


def _docs(spark):
    rows = []
    # src_a: 10 docs x 4 tokens = 40; src_b: 5 x 4 = 20; src_c: 20 x 4 = 80
    for i, (src, n) in enumerate([("src_a", 10), ("src_b", 5), ("src_c", 20)]):
        base = i * 1000
        rows += [(base + j, src, "w x y z") for j in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mixture_plan_budget_math(spark):
    """target = floor(budget·w/Σw); rate clamps at 1; epochs = ceil of the
    deficit ratio — checked against exact Python arithmetic."""
    docs = _docs(spark)
    plan = {
        r["source"]: r
        for r in mixture_plan(
            docs,
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long"),
            budget=120,
            weights={"src_a": 2.0},  # others default 1.0 → Σw = 4
        ).collect()
    }
    toks = {"src_a": 40, "src_b": 20, "src_c": 80}
    for src, w in [("src_a", 2.0), ("src_b", 1.0), ("src_c", 1.0)]:
        target = math.floor(120 * w / 4.0)
        r = plan[src]
        assert r["n_tokens"] == toks[src]
        assert r["target_tokens"] == target
        assert r["sample_rate"] == round(min(1.0, target / toks[src]), 6)
        assert r["epochs"] == max(1, math.ceil(target / toks[src]))
    # src_a is under-represented (target 60 > 40) → upsample 2 epochs
    assert plan["src_a"]["epochs"] == 2 and plan["src_a"]["sample_rate"] == 1.0
    # src_c is over-represented (target 30 < 80) → downsample, 1 epoch
    assert plan["src_c"]["epochs"] == 1 and plan["src_c"]["sample_rate"] < 1.0


def test_upsample_epochs_replicates_and_interleaves(spark):
    docs = _docs(spark)
    out = upsample_epochs(
        docs, "doc_id", "source", epochs={"src_a": 3, "src_b": 2}, n_shards=4
    ).collect()
    # every (doc, epoch) instance exactly once, counts per source honored
    inst = [(r["doc_id"], r["epoch"]) for r in out]
    assert len(inst) == len(set(inst)) == 10 * 3 + 5 * 2 + 20 * 1
    # positions are a contiguous 1..n ranking within each shard
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # epochs of one doc land on independent positions (interleaved, not
    # adjacent): doc 0 has 3 instances — they must not be consecutive in
    # any single shard ordering
    d0 = sorted((r["shard"], r["pos"]) for r in out if r["doc_id"] == 0)
    assert len({s for s, _ in d0}) > 1 or any(
        b - a > 1 for (_, a), (_, b) in zip(d0, d0[1:])
    )


def test_upsample_epochs_partitioning_invariant(spark):
    """Byte-identical training order under different input partitionings —
    the property rand()-based shuffles lack."""
    docs = _docs(spark)
    a = upsample_epochs(
        docs.repartition(7), "doc_id", "source", epochs={"src_a": 2}, n_shards=4
    )
    b = upsample_epochs(
        docs.coalesce(1), "doc_id", "source", epochs={"src_a": 2}, n_shards=4
    )
    canon = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["epoch"], r["shard"], r["pos"]) for r in df.collect()
    )
    assert canon(a) == canon(b)


def test_mixture_plan_property(spark):
    """Property: for random budgets/weights/corpora, the plan's float
    columns equal exact Python arithmetic (same floor/ceil/round), the
    token budget is never exceeded by target sums, and every
    under-target source gets epochs ≥ 2."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(  # (source index, n_docs, tokens/doc)
            st.tuples(st.integers(0, 3), st.integers(1, 6), st.integers(1, 9)),
            min_size=1,
            max_size=4,
            unique_by=lambda t: t[0],
        ),
        st.integers(10, 500),
        st.floats(0.5, 4.0),
    )
    def prop(srcs, budget, w0):
        rows = []
        for si, nd, tpd in srcs:
            rows += [
                (si * 100 + j, f"s{si}", " ".join(["t"] * tpd))
                for j in range(nd)
            ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        plan = mixture_plan(
            df,
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long"),
            budget=budget,
            weights={"s0": w0},
        ).collect()
        w_total = sum(w0 if r["source"] == "s0" else 1.0 for r in plan)
        assert sum(r["target_tokens"] for r in plan) <= budget
        for r in plan:
            w = w0 if r["source"] == "s0" else 1.0
            target = math.floor(budget * w / w_total)
            assert r["target_tokens"] == target
            assert r["sample_rate"] == round(
                min(1.0, target / r["n_tokens"]), 6
            )
            assert r["epochs"] == max(1, math.ceil(target / r["n_tokens"]))
            if target > r["n_tokens"]:
                assert r["epochs"] >= 2

    prop()
