"""Skew mitigation (SURVEY §7 M6 100 TB notes; session.py turns AQE's
skew-join splitting on, which covers sort-merge joins at runtime).

Manual salting remains necessary where AQE cannot help: shuffle-hash
joins it declines to split, aggregations whose partials do not shrink
(collect_list/collect_set over a hot key), and any co-partitioned
pipeline that must keep one partitioning across stages. The operators
here implement the standard construction — deterministic salt on the
big/skewed side, salt-explosion on the small side — with semantics
identical to the unsalted op (oracle-checked in the roster).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["salted_equi_join", "two_stage_collect", "capped_top_per_key"]


def salted_equi_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_expr: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the ``skewed`` side's hot keys overwhelm single
    reducers: each skewed row gets a deterministic salt in [0, n_salts)
    (pass a hash of the row's natural id as ``salt_expr`` — NOT rand(),
    which breaks retry/recompute determinism), the ``other`` side is
    replicated ×n_salts, and the join key becomes (key, salt) — a hot
    key's rows now spread over n_salts reducers.

    Cost model: other side shuffles ×n_salts; use only when the skewed
    key histogram warrants it and ``other`` is too big to broadcast
    (broadcast makes salting moot).

    Only ``inner`` and ``left``(-outer) are supported: the ``other`` side
    is replicated ×n_salts, so under right/full joins every unmatched
    replica of an ``other`` row would surface — n_salts duplicates of
    each unmatched right row — silently corrupting outer semantics.
    Unmatched ``skewed`` rows are safe (each carries exactly one salt).
    """
    allowed = {"inner", "left", "leftouter", "left_outer"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_equi_join supports how in {{'inner', 'left'}}, got {how!r}: "
            "the replicated side breaks right/full outer-join semantics"
        )
    left = skewed.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salts)).cast("int"))
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, [key, "_salt"], how).drop("_salt")


def two_stage_collect(
    df: DataFrame,
    key: str,
    value: str,
    salt_expr: Column,
    n_salts: int = 8,
) -> DataFrame:
    """collect_list over a skewed key without a single-reducer hot spot:
    stage 1 collects per (key, salt) — n_salts bounded partials per hot
    key — stage 2 flattens the partial lists. The result is sorted for
    determinism (collect order is partitioning-dependent by contract).
    """
    staged = (
        df.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salts)).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    return (
        staged.groupBy(key)
        .agg(F.array_sort(F.flatten(F.collect_list("_part"))).alias(f"{value}s"))
    )


def capped_top_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    n: int,
    rank_col: str = "rk",
    n_salts: int = 8,
) -> DataFrame:
    """First-n-per-key (by ``order_col`` ascending) without a hot key
    sorting all of its rows on one reducer: stage 1 takes the first n
    within each (key, salt) — the global first-n is always a subset of
    the per-salt first-n union — so stage 2's real ranking sorts at most
    n·n_salts rows per key instead of the key's full row count. Salt is
    a deterministic hash of the order column (never rand(): retries must
    recompute identically). Output = input rows with ``rank_col`` 1..n
    per key, identical to the single-window form.
    """
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts)).cast("int")
    w1 = Window.partitionBy(key, "_salt").orderBy(order_col)
    pre = (
        df.withColumn("_salt", salt)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= n)
        .drop("_salt", "_rk1")
    )
    w2 = Window.partitionBy(key).orderBy(order_col)
    return pre.withColumn(
        rank_col, F.row_number().over(w2).cast("long")
    ).filter(F.col(rank_col) <= n)
