"""Event-sequence analytics: funnels and cohort retention.

Classic event-stream OLAP over the ``events`` surface — the query
shapes a product team runs on the same table the streaming jobs ingest
(SURVEY §2.I). Both are pure relational compositions.

Scale notes (100 TB): each funnel step is one filtered aggregation of
the events scan (predicate pushdown keeps non-step events out of the
shuffle) followed by a per-user equi-join — all shuffles are keyed on
``user_id``, so co-partitioning carries across steps and AQE collapses
the join chain into one stage per step. Cohort retention shuffles
(user, day) pairs once, then aggregates (cohort, offset) — output
cardinality is days², independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_stages", "cohort_retention"]


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel completion per user.

    Step i counts only at a strictly later timestamp than step i-1's
    first completion (first-touch semantics: ``min(ts)`` per step).
    Output: one row per user who completed step 1, with ``t1..tn``
    (null once the funnel is abandoned) and ``stage`` = deepest step
    reached.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("_ts"))
            .join(cur.select(user_col, F.col(f"t{i-1}").alias("_prev")), user_col)
            .filter(F.col("_ts") > F.col("_prev"))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    # deepest-first when-chain: the first non-null step timestamp wins
    stage = F.coalesce(
        *[
            F.when(F.col(f"t{i}").isNotNull(), F.lit(i))
            for i in range(len(steps), 1, -1)
        ],
        F.lit(1),
    )
    return cur.withColumn("stage", stage.cast("long"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "day",
) -> DataFrame:
    """Cohort × offset retention counts.

    Cohort = first-activity period per user; one row per (cohort,
    offset) with the distinct users from that cohort active again
    ``offset`` periods later (offset 0 = cohort size).
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("cohort")
    )
    active = events.select(
        user_col, F.date_trunc(granularity, F.col(ts_col)).alias("d")
    ).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort",
            F.datediff(F.col("d"), F.col("cohort")).cast("long").alias("offset"),
        )
        .agg(F.count_distinct(user_col).alias("n_active"))
    )
