"""Similarity search over embedding columns (SURVEY §2.C3, §2.K, §4.3.1).

Three tiers by corpus size:

1. ``brute_force_topk`` — exact; broadcast query batch + per-row cosine +
   per-query top-k window. Fine to ~10^8 corpus rows.
2. ``lsh_topk`` — BucketedRandomProjectionLSH approxNearestNeighbors /
   approxSimilarityJoin (MLlib); probabilistic recall, corpus-shuffle-free
   candidate generation.
3. ``ivf_topk`` — inverted-file ANN: k-means-ish coarse centroids (sampled
   deterministic seeds), corpus partitioned by nearest centroid, queries
   probe ``n_probe`` nearest centroids only; the scan prunes to
   |corpus| * n_probe / n_centroids rows via a centroid equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from review_engine_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_normalize_rows,
)

__all__ = ["brute_force_topk", "brute_force_topk_batch", "lsh_topk", "ivf_topk"]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "qv",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    The query side is broadcast (queries ≪ corpus); the corpus is scanned
    once with a row-local cosine expression — no shuffle until the
    per-query top-k window, which moves only candidate rows keyed by
    query_id. Rounding before ranking keeps the cut engine-stable.
    """
    pairs = F.broadcast(queries).join(
        corpus, F.col(corpus_id) != F.col(query_id)
    )
    scored = pairs.select(
        query_id,
        F.col(corpus_id).alias("neighbor_id"),
        F.round(cosine_similarity(F.col(query_vec), F.col(corpus_vec)), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= k
    )


def lsh_topk(
    corpus: DataFrame,
    query_vecs: list[list[float]],
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    max_distance: float = 1.3,
) -> DataFrame:
    """Approximate k-NN via BucketedRandomProjectionLSH (MLlib).

    Vectors are L2-normalized first so euclidean-LSH distance is a
    monotone proxy for cosine (||a-b||² = 2 - 2·cos on the unit sphere);
    ``max_distance`` 1.3 ≈ cosine 0.15 — candidates below that are noise.

    The query batch goes through ONE ``approxSimilarityJoin`` (a
    distributed bucket join) + a per-query top-k window — not the
    per-query ``approxNearestNeighbors`` loop, which launches a full
    corpus job per query vector and cannot scale past a handful of
    queries.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import SparkSession

    spark = corpus.sparkSession
    unit = l2_normalize_rows(corpus, corpus_vec, "_unit").select(
        F.col(corpus_id),
        array_to_vector(F.col("_unit")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(unit)

    def _norm(q: list[float]) -> list[float]:
        n = sum(x * x for x in q) ** 0.5 or 1.0
        return [float(x) / n for x in q]

    queries = spark.createDataFrame(
        [(i, _norm(q)) for i, q in enumerate(query_vecs)],
        "query_idx int, qv array<double>",
    ).select("query_idx", array_to_vector(F.col("qv")).alias("features"))

    joined = model.approxSimilarityJoin(
        queries, unit, max_distance, distCol="dist"
    ).select(
        F.col("datasetA.query_idx").alias("query_idx"),
        F.col(f"datasetB.{corpus_id}").alias("neighbor_id"),
        F.round(1.0 - F.col("dist") * F.col("dist") / 2.0, 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_idx").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "qv",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Inverted-file ANN as a two-join plan.

    Coarse centroids = deterministic corpus sample (every (N/n)-th row by
    id hash — at scale, replace with MLlib KMeans fit on a sample).
    Corpus rows are assigned to their nearest centroid once (narrow pass +
    small broadcast); queries probe their n_probe nearest centroids, and
    the candidate join is an equi-join on centroid_id — pruning the scan
    to n_probe/n_centroids of the corpus.
    """
    cents = (
        corpus.withColumn("_h", F.abs(F.xxhash64(F.col(corpus_id))) % n_centroids)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_h").orderBy(F.col(corpus_id))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_h").alias("centroid_id"), F.col(corpus_vec).alias("centroid_vec")
        )
    )
    cents = F.broadcast(cents)

    # assign each corpus row to its nearest centroid (1 narrow pass)
    assign_w = Window.partitionBy(corpus_id).orderBy(
        F.desc("c_sim"), F.asc("centroid_id")
    )
    assigned = (
        corpus.join(cents)
        .select(
            F.col(corpus_id),
            F.col(corpus_vec),
            "centroid_id",
            cosine_similarity(F.col(corpus_vec), F.col("centroid_vec")).alias("c_sim"),
        )
        .withColumn("_r", F.row_number().over(assign_w))
        .filter(F.col("_r") == 1)
        .drop("_r", "c_sim")
    )

    # queries probe their n_probe nearest centroids
    probe_w = Window.partitionBy(query_id).orderBy(F.desc("q_sim"), F.asc("centroid_id"))
    probes = (
        F.broadcast(queries)
        .join(cents)
        .select(
            query_id,
            F.col(query_vec),
            "centroid_id",
            cosine_similarity(F.col(query_vec), F.col("centroid_vec")).alias("q_sim"),
        )
        .withColumn("_r", F.row_number().over(probe_w))
        .filter(F.col("_r") <= n_probe)
        .drop("_r", "q_sim")
    )

    # candidate equi-join on centroid_id, then exact rerank + top-k
    cand = probes.join(assigned, "centroid_id").filter(
        F.col(corpus_id) != F.col(query_id)
    )
    scored = cand.select(
        query_id,
        F.col(corpus_id).alias("neighbor_id"),
        F.round(cosine_similarity(F.col(query_vec), F.col(corpus_vec)), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= k
    )


def brute_force_topk_batch(
    corpus: DataFrame,
    query_vecs: list[list[float]],
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact batch k-NN on the numpy fast path: (query_idx, neighbor_id,
    cos_sim, rn).

    The expression-form cosine (``brute_force_topk``) is O(dim) of
    interpreted-expression work per (row, query); past a few hundred
    dimensions the Arrow-batched matmul wins an order of magnitude:
    each partition computes ``M @ Q.T`` against the (pickled, tiny)
    query matrix and emits only its LOCAL top-k per query — the shuffle
    then carries ≤ partitions·k·q rows into the global top-k window,
    never the corpus. Cosine matches the expression kernel exactly:
    dot/(|a|·|b| + 1e-9), rounded to 6; ties break to the lower id.
    No self-exclusion — external queries don't have corpus ids.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField as SF,
        StructType as ST,
    )

    q_mat = np.asarray(query_vecs, dtype=np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1)

    def local_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[corpus_vec].to_numpy()).astype(np.float64)
            ids = pdf[corpus_id].to_numpy()
            norms = np.linalg.norm(mat, axis=1)
            sims = np.round(
                (mat @ q_mat.T) / (norms[:, None] * q_norms[None, :] + 1e-9),
                6,
            )
            for qi in range(q_mat.shape[0]):
                order = np.lexsort((ids, -sims[:, qi]))[:k]
                yield pd.DataFrame(
                    {
                        "query_idx": qi,
                        "neighbor_id": ids[order],
                        "cos_sim": sims[order, qi],
                    }
                )

    schema = ST(
        [
            SF("query_idx", IntegerType()),
            SF("neighbor_id", LongType()),
            SF("cos_sim", DoubleType()),
        ]
    )
    local = corpus.select(corpus_id, corpus_vec).mapInPandas(
        local_topk, schema
    )
    w = Window.partitionBy("query_idx").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return local.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= k
    )
