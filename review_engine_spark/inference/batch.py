"""predict_batch_udf constructors (SURVEY §2.J J1/J3 production path).

``pyspark.ml.functions.predict_batch_udf`` is the engine's real model
path: the ``make_model`` loader runs once per Python worker (the model is
cached across batches — the per-executor model cache the reference gets
by being single-process, embed.py:10), inputs arrive as numpy batches of
``batch_size`` (the reference's batching knob: 700 for the embedder,
embed.py:75; 32 for the cross-encoder, rank.py:15), and output schemas
match the stub UDFs in ``inference.stubs`` exactly — swapping a stub for
a real model changes one constructor argument, never the plan.

The default loaders here are deterministic hash models so the full
machinery (worker-side caching, Arrow batch transfer, numpy marshalling)
is exercised in tests without any model dependency.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

__all__ = ["embedder_batch_udf", "scorer_batch_udf", "stub_embed_model", "stub_score_model"]


def stub_embed_model(dim: int = 16) -> Callable:
    """Deterministic text→vector model loader (J1 stand-in)."""

    def make_model():
        import hashlib

        def predict(inputs: np.ndarray) -> np.ndarray:
            out = np.empty((len(inputs), dim), dtype=np.float64)
            for i, t in enumerate(inputs):
                data = str(t).encode("utf-8", "replace")
                raw = []
                counter = 0
                while len(raw) < dim:
                    digest = hashlib.md5(
                        data + counter.to_bytes(4, "little")
                    ).digest()
                    raw.extend(b / 255.0 - 0.5 for b in digest)
                    counter += 1
                v = np.array(raw[:dim])
                out[i] = v / (np.linalg.norm(v) or 1.0)
            return out

        return predict

    return make_model


def stub_score_model() -> Callable:
    """Deterministic (query, doc)→score model loader (J3 stand-in)."""

    def make_model():
        import hashlib

        def predict(queries: np.ndarray, docs: np.ndarray) -> np.ndarray:
            out = np.empty(len(queries), dtype=np.float64)
            for i, (q, d) in enumerate(zip(queries, docs)):
                h = hashlib.md5(f"{q}|{d}".encode("utf-8", "replace")).digest()
                out[i] = int.from_bytes(h[:4], "little") / 2**32
            return out

        return predict

    return make_model


def embedder_batch_udf(make_model: Callable | None = None, dim: int = 16, batch_size: int = 700):
    """J1: text → array<double> via predict_batch_udf (embed.py:73-78
    analog; batch_size mirrors the reference's 700). Pass a loader that
    returns a SentenceTransformer-style ``predict(batch) -> ndarray`` for
    the real model."""
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import ArrayType, DoubleType

    return predict_batch_udf(
        make_model or stub_embed_model(dim),
        return_type=ArrayType(DoubleType()),
        batch_size=batch_size,
    )


def scorer_batch_udf(make_model: Callable | None = None, batch_size: int = 32):
    """J3: (query, document) → double via predict_batch_udf (rank.py:15-41
    analog; batch_size mirrors the reference's 32)."""
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import DoubleType

    return predict_batch_udf(
        make_model or stub_score_model(),
        return_type=DoubleType(),
        batch_size=batch_size,
    )
