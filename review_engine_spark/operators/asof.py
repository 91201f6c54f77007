"""As-of (point-in-time) join operators (engine surface the reference
lacks; the feature-at-event-time primitive of training pipelines).

Two implementations with identical semantics (latest right row
at-or-before each left row; ties on time broken by max right id):

- the **relational** union+window plan (plans.roster_rel.q_asof_join):
  one shuffle on the key, pure JVM — the default.
- the **cogrouped** pandas form here: ``groupBy(key).cogroup(...).
  applyInPandas(merge_asof)`` — the extension point when the per-key
  merge logic outgrows relational algebra (tolerance windows, nearest
  rather than backward, multi-column interpolation). Arrow-batched,
  one shuffle on the key; each key's two sides meet in one pandas call.

Both are declared in the roster against the SAME oracle — the
equivalence is CI-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["asof_join_cogrouped"]


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_val: str,
) -> DataFrame:
    """Per-key pandas ``merge_asof`` over a cogroup.

    Output: one row per left row — ``(left_id, asof_<right_val>)`` with
    NULL where no right row exists at-or-before the left timestamp.
    Rows of the right side are pre-sorted by (ts, val) so equal-time
    duplicates resolve to the max value — matching the relational plan's
    tie rule exactly.
    """
    out_schema = f"{left_id} long, asof_{right_val} long"

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(left_ts)
        if r_pdf.empty:
            return pd.DataFrame(
                {
                    left_id: l_sorted[left_id],
                    f"asof_{right_val}": pd.Series(
                        [pd.NA] * len(l_sorted), dtype="Int64"
                    ),
                }
            )
        # stable sort by (ts, val): merge_asof takes the LAST row ≤ ts,
        # so equal-ts duplicates resolve to max(val)
        r_sorted = r_pdf.sort_values([right_ts, right_val]).rename(
            columns={right_ts: left_ts}
        )
        merged = pd.merge_asof(
            l_sorted,
            r_sorted[[left_ts, right_val]],
            on=left_ts,
            direction="backward",
            allow_exact_matches=True,
        )
        return pd.DataFrame(
            {
                left_id: merged[left_id],
                f"asof_{right_val}": merged[right_val].astype("Int64"),
            }
        )

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, out_schema)
    )
