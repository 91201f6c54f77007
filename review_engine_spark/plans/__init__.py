"""Declared-query roster (SURVEY §2.L) — the correctness contract.

Each module registers queries into ``QUERIES`` (name → callable
``(spark, sf_dir) -> DataFrame``) and, where SQL-expressible, a matching
DuckDB oracle into ``ORACLES``. Registration order follows SURVEY §2's
operator inventory. Importing this package loads the full roster.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def declared(oracle: str | None = None):
    """Register a roster query; ``oracle=None`` marks a rows-only check."""

    def deco(fn):
        QUERIES[fn.__name__] = fn
        if oracle is not None:
            ORACLES[fn.__name__] = oracle
        return fn

    return deco


# Import for side effects: each module registers its queries.
from review_engine_spark.plans import roster_text  # noqa: E402,F401
from review_engine_spark.plans import roster_rel  # noqa: E402,F401
from review_engine_spark.plans import roster_vector  # noqa: E402,F401
from review_engine_spark.plans import roster_rank  # noqa: E402,F401
from review_engine_spark.plans import roster_ext  # noqa: E402,F401
from review_engine_spark.plans import roster_recsys  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "declared"]
