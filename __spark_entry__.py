"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The roster lives in ``review_engine_spark.plans`` (SURVEY.md §2.L);
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the multi-factor ranking
    pipeline (SURVEY §3.1) — metadata join, Bayesian rating, popularity,
    price fit, pseudo-rerank, weighted blend, priced-first top-10."""
    from review_engine_spark.plans.roster_rank import q_rank_blend

    return q_rank_blend(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from review_engine_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every deterministic query in queries();
    rows-only operators (model stubs / approx / iterative / streaming)
    are intentionally absent (SURVEY §2.L)."""
    from review_engine_spark.plans import ORACLES

    return dict(ORACLES)
