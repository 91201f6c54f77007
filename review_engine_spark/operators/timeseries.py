"""Time-series resampling: regular-grid buckets with forward fill.

Feature pipelines need observations on a regular clock (model inputs,
joins against other series); event data is irregular. This operator
buckets per key, densifies the grid between each key's first and last
observation, and forward-fills gaps — all relationally.

Scale notes (100 TB): the grid explode is narrow (bounded by each
key's own time span — no global calendar cross-join, which would be
|keys| × |global span| and mostly waste); the fill is one per-key
window over the grid, shuffled by key once. A key with a years-long
span and sparse events still only materializes its own buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_ffill"]


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    granularity: str = "hour",
) -> DataFrame:
    """Per-key regular grid with forward-filled values.

    Output: (key, bucket, v_obs, v_filled, is_gap) — ``v_obs`` is the
    bucket's observed mean (null in gaps), ``v_filled`` carries the
    last observation forward (``last(..., ignorenulls)`` over an
    unbounded-preceding frame). Bucket 0 of every key is an observation
    by construction (the grid starts at the key's first event), so
    ``v_filled`` is never null.
    """
    bucketed = (
        events.groupBy(
            key_col, F.date_trunc(granularity, F.col(ts_col)).alias("bucket")
        )
        .agg(F.round(F.avg(value_col), 6).alias("v_obs"))
    )
    bounds = bucketed.groupBy(key_col).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("b0", "b1", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    joined = grid.join(bucketed, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        "v_obs",
        F.last("v_obs", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v_obs").isNull().alias("is_gap"),
    )
