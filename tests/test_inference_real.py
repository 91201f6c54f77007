"""Optional real-model smoke through ``predict_batch_udf`` (§2.J).

Proves ``embedder_batch_udf`` accepts a REAL model loader — the behavior
the stubs claim to stand in for (reference embed.py:73-78) — not only the
deterministic hash models: loads a tiny public sentence-transformer and
runs the q_embed_etl shape over fixture documents. Skips cleanly when the
library or the model weights are unavailable (the GPU-less/offline
sandbox), so CI is green either way and the smoke activates the moment an
environment can supply the model.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

sentence_transformers = pytest.importorskip(
    "sentence_transformers", reason="real-model smoke needs sentence-transformers"
)

_MODEL_NAME = "sentence-transformers/all-MiniLM-L6-v2"


@pytest.fixture(scope="module")
def model_dim():
    """Resolve the model once driver-side: proves weights are present
    (local HF cache or network) so the worker-side load cannot fail for
    availability reasons; skip otherwise."""
    try:
        model = sentence_transformers.SentenceTransformer(_MODEL_NAME, device="cpu")
    except Exception as exc:  # noqa: BLE001 — any load failure means "unavailable"
        pytest.skip(f"model {_MODEL_NAME} unavailable: {exc}")
    return model.get_sentence_embedding_dimension()


def test_real_sentence_transformer_through_predict_batch_udf(spark, sf_dir, model_dim):
    from review_engine_spark.inference.batch import embedder_batch_udf

    def make_model():
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(_MODEL_NAME, device="cpu")

        def predict(batch):
            return model.encode(
                [str(t) for t in batch], normalize_embeddings=True
            )

        return predict

    udf = embedder_batch_udf(make_model, dim=model_dim, batch_size=8)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(8)
    )
    rows = docs.withColumn("embedding", udf(F.col("text"))).collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r.embedding) == model_dim
        norm = math.sqrt(sum(v * v for v in r.embedding))
        assert abs(norm - 1.0) < 1e-4  # normalize_embeddings=True contract
