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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "l2_normalize_rows",
    "cosine_similarity",
    "EPSILON",
]

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

    NOTE: as a single expression, the norm subtree sits inside the
    transform lambda and is re-evaluated per element — O(dim²) per row.
    Fine to a few hundred dims; for wide vectors use
    ``l2_normalize_rows`` (measured 250× faster at dim=1024).
    """
    denom = l2_norm(v) + F.lit(epsilon)
    return F.transform(v, lambda x: x.cast("double") / denom)


def l2_normalize_rows(
    df: DataFrame,
    vec_col: str,
    out_col: str | None = None,
    epsilon: float = EPSILON,
) -> DataFrame:
    """DataFrame-level L2 normalize: O(dim) per row for any width.

    The norm is materialized as a real column in its own projection; the
    consumer references it twice (a trivially-true guard plus the lambda),
    which stops CollapseProject from inlining the aggregate back into the
    lambda where it would be re-evaluated per element. Measured at
    dim=1024 × 2k rows: 133 s (inlined) vs 0.5 s (staged).
    """
    out_col = out_col or vec_col
    nrm = f"_nrm_{vec_col}"
    staged = df.withColumn(nrm, l2_norm(F.col(vec_col)))
    unit = F.when(
        # always true for non-null vectors — the second reference to the
        # norm column is what defeats projection collapsing
        F.col(nrm) >= 0,
        F.transform(
            F.col(vec_col), lambda x: x.cast("double") / (F.col(nrm) + F.lit(epsilon))
        ),
    )
    return staged.withColumn(out_col, unit).drop(nrm)


def cosine_similarity(a: Column, b: Column, epsilon: float = EPSILON) -> Column:
    """H23: cosine similarity — dot over norms (semantic.py:41 semantics;
    sklearn normalizes both sides internally). Epsilon-guarded against
    zero vectors.
    """
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b) + F.lit(epsilon))
