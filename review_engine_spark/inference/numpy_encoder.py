"""A dependency-free neural text encoder for the real-model smoke path.

``tiny_encoder_model`` returns a ``predict_batch_udf`` loader with the
SAME callable contract a SentenceTransformer wrapper has (reference
embed.py:73-78: load once per worker, ``predict(batch) -> ndarray`` of
L2-normalized rows) — but the model is a genuine untrained encoder
implemented in plain numpy, so the contract can be exercised end-to-end
in environments with no ML libraries and no model weights:

  token ids   : hashing trick (xxhash-free: Python's stable md5) into a
                2**hash_bits vocabulary — the standard feature-hashing
                construction, no vocab file needed
  embedding   : seeded Gaussian matrix  V x d_embed
  pooling     : masked mean over the token axis
  projection  : dense d_embed -> dim with tanh nonlinearity
  output      : L2-normalized float64 rows (matching the
                ``normalize_embeddings=True`` contract the real
                sentence-transformer test path asserts)

Weights are materialized INSIDE ``make_model`` from a fixed seed: every
Python worker reconstructs identical matrices, so the encoder is
deterministic cluster-wide without shipping any state — the same
load-once-per-worker shape a real weights file would have.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import numpy as np

__all__ = ["tiny_encoder_model"]


def tiny_encoder_model(
    dim: int = 32,
    d_embed: int = 64,
    hash_bits: int = 12,
    seed: int = 0,
    max_tokens: int = 64,
) -> Callable:
    """Loader for a deterministic numpy encoder (J1 real-path smoke)."""

    def make_model():
        rng = np.random.default_rng(seed)
        vocab = 1 << hash_bits
        emb = rng.standard_normal((vocab, d_embed)) / np.sqrt(d_embed)
        proj = rng.standard_normal((d_embed, dim)) / np.sqrt(d_embed)
        bias = rng.standard_normal(dim) * 0.01
        mask = vocab - 1

        def token_ids(text: str) -> list[int]:
            toks = text.lower().split()[:max_tokens]
            return [
                int.from_bytes(
                    hashlib.md5(t.encode("utf-8", "replace")).digest()[:4],
                    "little",
                )
                & mask
                for t in toks
            ] or [0]

        def predict(inputs: np.ndarray) -> np.ndarray:
            out = np.empty((len(inputs), dim), dtype=np.float64)
            for i, t in enumerate(inputs):
                ids = token_ids(str(t))
                pooled = emb[ids].mean(axis=0)
                v = np.tanh(pooled @ proj + bias)
                out[i] = v / (np.linalg.norm(v) or 1.0)
            return out

        return predict

    return make_model
