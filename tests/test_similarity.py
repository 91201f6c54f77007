

def test_batch_topk_matches_python_reference(spark):
    """The numpy matmul path must reproduce the expression kernel's
    cosine (dot/(|a||b|+1e-9), round 6) with low-id tie-breaks, and the
    per-partition local cut must never lose a global top-k member."""
    import random

    from review_engine_spark.operators.similarity import brute_force_topk_batch

    rng = random.Random(9)
    corpus = [
        (i, [rng.gauss(0, 1) for _ in range(12)]) for i in range(200)
    ]
    queries = [[rng.gauss(0, 1) for _ in range(12)] for _ in range(3)]
    # many partitions so the local-cut-then-merge path actually executes
    df = spark.createDataFrame(
        corpus, "vec_id long, embedding array<double>"
    ).repartition(16)
    got = {
        (r["query_idx"], r["rn"]): (r["neighbor_id"], r["cos_sim"])
        for r in brute_force_topk_batch(df, queries, k=7).collect()
    }

    def cos(a, b):
        import math

        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return round(dot / (na * nb + 1e-9), 6)

    for qi, q in enumerate(queries):
        ranked = sorted(
            ((cos(v, q), -i) for i, v in corpus), key=lambda t: (-t[0], -t[1])
        )[:7]
        for rn, (sim, neg_id) in enumerate(ranked, start=1):
            assert got[(qi, rn)] == (-neg_id, sim), (qi, rn)


def test_pca_power_recovers_rank1_direction(spark, tmp_path):
    """Vectors all parallel to (3, 1): the top component converges to
    the infinity-normalized direction (1.0, 1/3) immediately, and the
    deterministic all-ones start fixes the sign."""
    import pandas as pd
    import pytest as _pytest

    from review_engine_spark.plans.roster_vector import q_pca_power

    vecs = [[3.0, 1.0], [6.0, 2.0], [-3.0, -1.0], [30.0, 10.0]]
    pd.DataFrame(
        {"vec_id": range(1, 5), "embedding": vecs}
    ).to_parquet(tmp_path / "embeddings.parquet")

    out = {r["pos"]: r["component"] for r in q_pca_power(spark, str(tmp_path)).collect()}
    assert out[1] == _pytest.approx(1.0, abs=1e-9)
    assert out[2] == _pytest.approx(1 / 3, abs=1e-5)
