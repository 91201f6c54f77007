"""Model-inference surface (SURVEY §2.J) — interfaces + deterministic stubs.

The reference wraps four models: a sentence embedder (embed.py:10), a
cross-encoder reranker (rank.py:9-12), a VLM captioner (summarize.py:64),
and a chat LLM (rag.py:26-30). The engine keeps them behind small
interfaces whose production path is an Arrow-batched
``predict_batch_udf`` / ``mapInPandas`` (per-executor model cache) and
whose test path is a seeded hash stub — so every pipeline *shape* is
deterministic and CI-checkable without GPUs (SURVEY §5.2.4).
"""

from review_engine_spark.inference.batch import (
    embedder_batch_udf,
    scorer_batch_udf,
)
from review_engine_spark.inference.stubs import (
    StubChat,
    StubEmbedder,
    StubScorer,
    stub_chat_udf,
    stub_embed_udf,
    stub_score_udf,
)

__all__ = [
    "StubChat",
    "StubEmbedder",
    "StubScorer",
    "embedder_batch_udf",
    "scorer_batch_udf",
    "stub_chat_udf",
    "stub_embed_udf",
    "stub_score_udf",
]
