"""Deterministic inference stubs (SURVEY §5.2.4).

Each stub derives its output from a stable hash (md5) of the input text,
so distributed runs are reproducible regardless of partitioning, batch
boundaries, or executor count — the properties a real model UDF must also
hold. All are Arrow-batched pandas UDFs: the hot path stays vectorized
per batch even though the stub math is trivial, mirroring how a real
``predict_batch_udf`` would amortize model dispatch.

Production swap-in: replace the ``pandas_udf`` bodies with
``pyspark.ml.functions.predict_batch_udf(make_model_fn, ...)`` loading
the corresponding model (sentence-transformer / cross-encoder / VLM /
chat endpoint); signatures and schemas are identical by design.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf

__all__ = [
    "StubEmbedder",
    "StubScorer",
    "StubChat",
    "stub_embed_udf",
    "stub_score_udf",
    "stub_chat_udf",
    "EMBED_DIM",
]

EMBED_DIM = 16


def _hash_floats(text: str, n: int, salt: str) -> list[float]:
    """n floats in [-1, 1) derived from md5(salt|text); L2-normalized like
    the reference's encode(normalize_embeddings=True) (embed.py:77)."""
    vals: list[float] = []
    counter = 0
    data = f"{salt}|{text}".encode("utf-8", errors="replace")
    while len(vals) < n:
        digest = hashlib.md5(data + counter.to_bytes(4, "little")).digest()
        for i in range(0, 16, 4):
            if len(vals) >= n:
                break
            u = int.from_bytes(digest[i : i + 4], "little")
            vals.append((u / 2**31) - 1.0)
        counter += 1
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


class StubEmbedder:
    """J1/J2: sentence-embedding stand-in (embed.py:73-78)."""

    def __init__(self, dim: int = EMBED_DIM, salt: str = "embed"):
        self.dim = dim
        self.salt = salt

    def encode(self, texts: list[str]) -> list[list[float]]:
        return [_hash_floats(t or "", self.dim, self.salt) for t in texts]


class StubScorer:
    """J3: cross-encoder stand-in — scores (query, document) pairs in
    [0, 1] (rank.py:15-41)."""

    def __init__(self, salt: str = "rerank"):
        self.salt = salt

    def score(self, queries: list[str], docs: list[str]) -> list[float]:
        out = []
        for q, d in zip(queries, docs):
            h = hashlib.md5(f"{self.salt}|{q}|{d}".encode("utf-8", "replace")).digest()
            out.append(int.from_bytes(h[:4], "little") / 2**32)
        return out


class StubChat:
    """J4/J5: chat/VLM stand-in — echoes a labeled deterministic answer so
    H11 extraction (summarize.py:15-25) has something real to parse."""

    def __init__(self, salt: str = "chat"):
        self.salt = salt

    def complete(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            h = hashlib.md5(f"{self.salt}|{p}".encode("utf-8", "replace")).hexdigest()
            out.append(f"ASSISTANT: stub answer {h[:8]}</s>")
        return out


def stub_embed_udf(dim: int = EMBED_DIM):
    """Arrow-batched embedding UDF: string → array<double>[dim].

    Marked non-deterministic: inference is expensive, so Catalyst must not
    push it through limits/sorts or duplicate it across plan branches —
    the cut-before-infer placement (SURVEY §4.3.3) is load-bearing.
    """

    @pandas_udf("array<double>")
    def embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = StubEmbedder(dim)  # per-task init == per-executor model cache
        for batch in it:
            yield pd.Series(model.encode(batch.fillna("").tolist()))

    return embed.asNondeterministic()


def stub_score_udf():
    """Arrow-batched rerank UDF: (query, doc) → double in [0, 1].

    Non-deterministic for the same placement-pinning reason as
    ``stub_embed_udf`` — keeps the UDF above the top-k cut in the plan.
    """

    @pandas_udf("double")
    def score(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        model = StubScorer()
        for queries, docs in it:
            yield pd.Series(
                model.score(queries.fillna("").tolist(), docs.fillna("").tolist())
            )

    return score.asNondeterministic()


def stub_chat_udf():
    """Arrow-batched chat UDF: prompt → raw completion string.
    Non-deterministic to pin placement (see ``stub_embed_udf``)."""

    @pandas_udf("string")
    def complete(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = StubChat()
        for prompts in it:
            yield pd.Series(model.complete(prompts.fillna("").tolist()))

    return complete.asNondeterministic()
