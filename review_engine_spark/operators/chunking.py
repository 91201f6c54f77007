"""Document chunking and embedding quantization — training-data /
RAG-corpus preparation operators (north-star §2.K family).

The reference's RAG store holds one whole-document blob per product
(`rag.py:49-52`); a real corpus is chunked into overlapping token
windows before embedding, and stored vectors are usually quantized.
Both operators here are pure expression compositions (JVM-side,
oracle-checkable) — no Python in the hot path.

Scale notes (100 TB): chunking is a narrow map + explode (no shuffle;
output partitioning follows the input scan), and the chunk count per
document is ceil((n_tok - overlap) / stride) so output size is linear
in corpus token count. Quantization is a per-row map that cuts vector
storage 4× (float32 → int8 semantics carried as small ints); the scale
factor survives in a side column for dequantization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_tokens", "chunk_documents", "quantize_vector", "dequantize_vector"]


def chunk_tokens(col: Column) -> Column:
    """Whitespace tokens of a lowercased document (empty tokens dropped)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunks: (id, chunk_idx, chunk_text, n_tok).

    Windows start every ``stride`` tokens and span ``chunk_size``; the
    final short window is kept iff it adds unseen tokens (start < n).
    Implemented as sequence → transform → posexplode: the token array is
    a materialized column, so the per-chunk slice does not re-run the
    tokenizer (the O(n²)-per-doc HOF pitfall — NOTES.md).
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = docs.select(
        F.col(id_col), chunk_tokens(F.col(text_col)).alias("toks")
    ).withColumn("n", F.size("toks"))
    starts = F.when(
        F.col("n") > 0,
        F.sequence(
            F.lit(0),
            ((F.col("n") - 1) / stride).cast("int") * stride,
            F.lit(stride),
        ),
    ).otherwise(F.array().cast("array<int>"))
    chunks = toks.select(
        F.col(id_col),
        F.col("toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    piece = F.slice(F.col("toks"), F.col("start") + 1, chunk_size)
    return chunks.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tok"),
    )


def quantize_vector(v: Column) -> tuple[Column, Column]:
    """Symmetric int8-style quantization: returns (codes, scale).

    codes[i] = round(127 * v[i] / max_abs(v)) as small ints; scale =
    max_abs / 127 reconstructs values. Zero vectors quantize to all-zero
    codes with scale 0. Deterministic: round-half-up on both engines is
    avoided by using bankers-insensitive floor(x + 0.5) semantics via
    round() on a value already scaled to integral grid — DuckDB and
    Spark agree on round() for .5 cases away from float noise, so codes
    are computed from round(x, 0) after a 6-digit pre-round.
    """
    max_abs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = max_abs / F.lit(127.0)
    codes = F.when(
        max_abs > 0.0,
        F.transform(
            v,
            lambda x: F.round(F.round(x.cast("double") / scale, 6), 0).cast(
                "long"
            ),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
    return codes, F.round(scale, 9)


def dequantize_vector(codes: Column, scale: Column) -> Column:
    """Inverse of ``quantize_vector``: codes[i] * scale."""
    return F.transform(codes, lambda c: c.cast("double") * scale)
