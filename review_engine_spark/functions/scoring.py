"""Scoring kernels (SURVEY §2.H, H15-H20).

The reference's ranking math (``rank.py:44-54``, ``rank.py:163-192``,
``rank.py:246-279``) re-expressed as Column arithmetic. Every None/dirty
branch the reference special-cases is reproduced with ``when``/``coalesce``
(SURVEY §1.1.2 — the missing-field tolerance is load-bearing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "minmax_normalize",
    "price_fit",
    "bayesian_rating",
    "log_popularity",
    "blend_score",
    "BLEND_WEIGHTS",
    "MMR_LAMBDA",
    "MAX_STAR_RATING",
]

#: rank.py:259-266 — the weighted-blend constants.
BLEND_WEIGHTS: dict[str, float] = {
    "alpha": 0.4,  # cosine similarity
    "beta": 0.2,  # bayesian rating
    "gamma": 0.1,  # popularity (min-max normalized)
    "delta": 0.15,  # price fit
    "epsilon": 0.15,  # reranker score (min-max normalized)
}
MMR_LAMBDA: float = 0.66  # rank.py:265
MAX_STAR_RATING: float = 5.0  # rank.py:194


def minmax_normalize(
    x: Column,
    low: Column,
    high: Column,
    epsilon: float = 1e-9,
    rtol: float = 1e-5,
    atol: float = 1e-8,
) -> Column:
    """H15+H20: robust min-max normalization (rank.py:44-54).

    ``low``/``high`` are the 1st/99th percentiles of the population
    (computed by the caller — D5, a 1-row aggregate broadcast back).
    Clip to [low, high]; degenerate band (``np.isclose(high, low)``,
    reproduced as ``|h-l| <= atol + rtol*|l|``) → constant 0.5; else
    ``(clipped - low) / (high - low + 1e-9)``.
    """
    clipped = F.least(F.greatest(x, low), high)
    degenerate = F.abs(high - low) <= (F.lit(atol) + F.lit(rtol) * F.abs(low))
    return F.when(degenerate, F.lit(0.5)).otherwise((clipped - low) / (high - low + F.lit(epsilon)))


def price_fit(
    price: Column,
    anchor: Column,
    price_std: Column | None = None,
    base_ratio: float = 0.3,
    std_weight: float = 0.5,
    over_weight: float = 0.6,
    under_weight: float = 1.2,
) -> Column:
    """H16: asymmetric Gaussian price-fit score (rank.py:163-179).

    No anchor (NULL or <= 0) → neutral 0.5; missing/dirty price (NULL or
    <= 0) → risky 0.2. Otherwise sigma_base = base_ratio*anchor, raised
    to std_weight*price_std when that is larger and positive; sigma is
    tighter above the anchor (0.6×) than below (1.2×);
    score = exp(-(price-anchor)^2 / (2*sigma^2)).
    """
    sigma_base = F.lit(base_ratio) * anchor
    if price_std is not None:
        sigma_base = F.when(
            price_std.isNotNull() & (price_std > 0),
            F.greatest(sigma_base, F.lit(std_weight) * price_std),
        ).otherwise(sigma_base)
    sigma = F.when(price > anchor, F.lit(over_weight)).otherwise(F.lit(under_weight)) * sigma_base
    gauss = F.exp(-F.pow(price - anchor, F.lit(2)) / (F.lit(2) * F.pow(sigma, F.lit(2))))
    return (
        F.when(anchor.isNull() | (anchor <= 0), F.lit(0.5))
        .when(price.isNull() | (price <= 0), F.lit(0.2))
        .otherwise(gauss)
    )


def bayesian_rating(
    rating: Column,
    rating_count: Column,
    global_avg: float = 4.3,
    m: float = 100.0,
) -> Column:
    """H17: Bayesian-smoothed rating (rank.py:182-189).

    NULL rating → prior ``global_avg``; NULL count → 0. Returns the raw
    (unscaled) smoothed rating; divide by MAX_STAR_RATING at the call
    site as rank.py:246 does.
    """
    r = F.coalesce(rating, F.lit(global_avg))
    n = F.coalesce(rating_count, F.lit(0.0)).cast("double")
    return (F.lit(global_avg) * F.lit(m) + r * n) / (F.lit(m) + n)


def log_popularity(review_count: Column) -> Column:
    """H18+B5: ``log1p(review_count)`` with the reference's guard —
    non-numeric/negative/NULL → 0.0 (rank.py:248).
    """
    return F.when(
        review_count.isNotNull() & (review_count >= 0),
        F.log1p(review_count.cast("double")),
    ).otherwise(F.lit(0.0))


def blend_score(
    sim: Column,
    bayes_rating_scaled: Column,
    pop_norm: Column,
    price_fit_score: Column,
    rerank_norm: Column,
    weights: dict[str, float] | None = None,
) -> Column:
    """H19: the weighted linear blend (rank.py:269-279)."""
    w = weights or BLEND_WEIGHTS
    return (
        F.lit(w["alpha"]) * sim
        + F.lit(w["beta"]) * bayes_rating_scaled
        + F.lit(w["gamma"]) * pop_norm
        + F.lit(w["delta"]) * price_fit_score
        + F.lit(w["epsilon"]) * rerank_norm
    )
