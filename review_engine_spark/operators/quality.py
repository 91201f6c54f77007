"""Data-quality operators: column profiling and referential integrity.

The reference tolerates dirty data branch-by-branch (SURVEY §1.1.2);
a pipeline at 100 TB needs the complement: *measuring* the dirt before
it hits consumers. Both operators are single-pass aggregations.

Scale notes: ``profile_table`` computes every column's stats in ONE
scan (one hash aggregation, no per-column jobs — the naive
describe-loop runs C scans for C columns). ``ri_violations`` is a
batch of broadcast-or-shuffle anti-join counts; each counts rows whose
foreign key has no match — the joins share the child scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table", "ri_violations"]


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile in one scan: nulls, distincts, min/max.

    Output: one row per column (col_name, n_rows, n_null, n_distinct,
    min_str, max_str) — min/max rendered as strings so heterogeneous
    column types fit one schema. Exact distincts (count_distinct), so
    the single aggregation still map-side combines.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__dist"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__dist").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def ri_violations(
    child: DataFrame,
    relations: list[tuple[str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (fk_col, parent, pk_col),
    count child rows whose non-null FK has no parent — one anti-join
    count per relation, unioned into (fk_col, n_orphans)."""
    outs = []
    for fk, parent, pk in relations:
        orphans = (
            child.select(F.col(fk))
            .filter(F.col(fk).isNotNull())
            .join(parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(fk).alias("fk_col"), "n_orphans")
        )
        outs.append(orphans)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
