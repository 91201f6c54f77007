"""Custom aggregate surface: Arrow-batched grouped-agg pandas UDFs.

Spark's built-in aggregate set has no concentration/inequality measure;
the Gini coefficient over a group's value distribution is the engine's
demonstration of the CUSTOM UDAF path — ``@pandas_udf`` in
``groupBy().agg()``, the whole group delivered to Python as one Arrow
batch (the same surface a bespoke loss statistic or a sketch finalizer
would use).

Two implementations with pinned-equal results (tests/test_udaf.py):

- ``gini_udaf`` — the pandas grouped-agg UDF. The group must fit in one
  worker's memory; right for bounded-cardinality groups (segments,
  languages, days).
- ``gini_expr_frame`` — the pure-Catalyst twin (rank window + one agg),
  which scales to groups of any size. At 100 TB prefer this form; the
  UDAF exists to prove the extension surface, not to win the plan.

Gini here is the standard sorted-rank form
``(2·Σ i·x_(i)) / (n·Σ x) − (n+1)/n`` (x sorted ascending, i = 1..n) —
tie-order-invariant (equal values contribute identically under any
permutation of their ranks), so both engines and any oracle agree
bit-for-bit after round(6).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

__all__ = ["gini_udaf", "gini_expr_frame"]


# DoubleType() instance, not the "double" DDL string: the string form is
# parsed through the active session at import time, and this module must
# import session-free (pytest collection, driver harness).
@pandas_udf(DoubleType())
def gini_udaf(v: pd.Series) -> float:
    s = v.dropna().sort_values().reset_index(drop=True)
    n = len(s)
    total = float(s.sum())
    if n == 0 or total == 0.0:
        return 0.0
    ranks = pd.RangeIndex(1, n + 1)
    return round(
        2.0 * float((s * ranks).sum()) / (n * total) - (n + 1) / n, 6
    )


def gini_expr_frame(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Catalyst form: rank each value within its group, then one
    map-side-combined aggregate of Σx and Σ i·x — scales to any group
    size (the window shuffles once on the group key, same as the agg).
    Returns (group_col, gini).
    """
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = df.filter(F.col(value_col).isNotNull()).withColumn(
        "_rk", F.row_number().over(w)
    )
    return ranked.groupBy(group_col).agg(
        F.when(
            F.sum(value_col) == 0.0, F.lit(0.0)
        )
        .otherwise(
            F.round(
                2.0
                * F.sum(F.col("_rk") * F.col(value_col))
                / (F.count("*") * F.sum(value_col))
                - (F.count("*") + 1) / F.count("*"),
                6,
            )
        )
        .alias("gini")
    )
