"""Dense-vector kernels (SURVEY §2.H, H21-H24).

The reference's numpy vector math (``rank.py:195-202``, ``rank.py:286-289``,
``semantic.py:41``, ``embed.py:77``) as higher-order array expressions.
All arithmetic is forced to double (fixture embeddings are float32;
float→double widening is exact, so Spark and the DuckDB oracle see the
same operand sequence). The np.stack "matrix" moment (semantic.py:37-38)
has no Spark counterpart by design — rows stay rows and the vectorization
is Tungsten's job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot_product", "l2_norm", "l2_normalize", "cosine_similarity", "EPSILON"]

EPSILON: float = 1e-9  # rank.py:205


def dot_product(a: Column, b: Column) -> Column:
    """H21: ``float(np.dot(a, b))`` with the reference's None tolerance —
    either operand NULL → 0.0 (rank.py:195-202).
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(dot)


def l2_norm(v: Column) -> Column:
    """Euclidean norm as a double expression."""
    return F.sqrt(
        F.aggregate(
            v,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(v: Column, epsilon: float = EPSILON) -> Column:
    """H22: ``v / (||v|| + 1e-9)`` (rank.py:286-289, embed.py:77).

    Returns array<double>. The epsilon keeps the all-zero vector at zero
    instead of NaN, matching the reference.
    """
    denom = l2_norm(v) + F.lit(epsilon)
    return F.transform(v, lambda x: x.cast("double") / denom)


def cosine_similarity(a: Column, b: Column, epsilon: float = EPSILON) -> Column:
    """H23: cosine similarity — dot over norms (semantic.py:41 semantics;
    sklearn normalizes both sides internally). Epsilon-guarded against
    zero vectors.
    """
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b) + F.lit(epsilon))
