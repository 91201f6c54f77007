"""Real-model smoke through ``predict_batch_udf`` (§2.J) — never skips.

Proves ``embedder_batch_udf`` accepts a REAL model loader — the behavior
the deterministic hash stubs stand in for (reference embed.py:73-78).
Two tiers:

* Always: a genuine (untrained) neural encoder in plain numpy —
  hashing-trick token ids → embedding matrix → masked mean-pool → dense
  tanh projection → L2 norm (``inference.numpy_encoder``). Same
  load-once-per-worker / ``predict(batch) -> ndarray`` contract a
  sentence-transformer wrapper has, zero dependencies, so the q_embed_etl
  shape runs a non-stub model end-to-end in every environment.
* When available: the same shape through an actual pretrained
  sentence-transformer (the original smoke), activating automatically in
  environments that can supply the weights.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

_MODEL_NAME = "sentence-transformers/all-MiniLM-L6-v2"


def _run_embed_etl(spark, sf_dir, udf, dim, n=8):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(n)
    )
    rows = docs.withColumn("embedding", udf(F.col("text"))).collect()
    assert len(rows) == n
    for r in rows:
        assert len(r.embedding) == dim
        norm = math.sqrt(sum(v * v for v in r.embedding))
        assert abs(norm - 1.0) < 1e-4  # L2-normalized output contract
    return rows


def test_numpy_encoder_through_predict_batch_udf(spark, sf_dir):
    """The dependency-free real path: actual weight matrices, batch
    encode, worker-side model caching — not a per-string hash."""
    from review_engine_spark.inference.batch import embedder_batch_udf
    from review_engine_spark.inference.numpy_encoder import tiny_encoder_model

    dim = 32
    udf = embedder_batch_udf(tiny_encoder_model(dim=dim), dim=dim, batch_size=8)
    rows = _run_embed_etl(spark, sf_dir, udf, dim)

    # Determinism across workers: driver-side reconstruction of the same
    # seeded model produces bit-comparable vectors for the same texts.
    predict = tiny_encoder_model(dim=dim)()
    import numpy as np

    texts = {
        row.doc_id: row.text
        for row in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(8)
        .collect()
    }
    for r in rows:
        local = predict(np.array([texts[r.doc_id]]))[0]
        assert max(abs(a - b) for a, b in zip(local, r.embedding)) < 1e-12


def _pretrained_dim():
    """Pretrained model dimension when library + weights exist, else
    None (no skip — the caller falls back to the numpy encoder)."""
    try:
        import sentence_transformers

        model = sentence_transformers.SentenceTransformer(_MODEL_NAME, device="cpu")
        return model.get_sentence_embedding_dimension()
    except Exception:  # noqa: BLE001 — any load failure means "unavailable"
        return None


def test_best_available_real_model_through_predict_batch_udf(spark, sf_dir):
    """Always runs: picks the pretrained sentence-transformer wherever
    the library and weights exist, else the numpy encoder — the SAME
    q_embed_etl shape either way, so the claim "the stub interface
    accepts a real model" executes in every environment."""
    from review_engine_spark.inference.batch import embedder_batch_udf
    from review_engine_spark.inference.numpy_encoder import tiny_encoder_model

    dim = _pretrained_dim()
    if dim is not None:

        def make_model():
            from sentence_transformers import SentenceTransformer

            m = SentenceTransformer(_MODEL_NAME, device="cpu")

            def predict(batch):
                return m.encode(
                    [str(t) for t in batch], normalize_embeddings=True
                )

            return predict

    else:
        dim = 48
        make_model = tiny_encoder_model(dim=dim)

    udf = embedder_batch_udf(make_model, dim=dim, batch_size=8)
    _run_embed_etl(spark, sf_dir, udf, dim)
