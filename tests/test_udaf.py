"""Custom grouped-agg UDAF vs its pure-Catalyst twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from review_engine_spark.operators.udaf import gini_expr_frame, gini_udaf


def test_gini_udaf_matches_expression_form(spark):
    rows = [
        ("a", float(v)) for v in [1, 1, 1, 1]          # perfect equality → 0
    ] + [
        ("b", float(v)) for v in [0, 0, 0, 10]         # concentrated
    ] + [
        ("c", float(v)) for v in [3, 1, 4, 1, 5, 9, 2, 6]
    ]
    df = spark.createDataFrame(rows, "g string, v double").repartition(5)
    udaf = {
        r["g"]: r["gini"]
        for r in df.groupBy("g").agg(gini_udaf(F.col("v")).alias("gini")).collect()
    }
    expr = {r["g"]: r["gini"] for r in gini_expr_frame(df, "g", "v").collect()}
    assert udaf == expr
    assert udaf["a"] == 0.0
    # 4 values, one holds everything: gini = 2*(4*10)/(4*10) - 5/4 = 0.75
    assert udaf["b"] == 0.75
    # python reference for the irregular group
    s = sorted([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0])
    n, tot = len(s), sum(s)
    ref = round(2 * sum((i + 1) * x for i, x in enumerate(s)) / (n * tot) - (n + 1) / n, 6)
    assert udaf["c"] == ref


def test_gini_empty_and_zero_groups(spark):
    df = spark.createDataFrame(
        [("z", 0.0), ("z", 0.0), ("n", None)], "g string, v double"
    )
    udaf = {
        r["g"]: r["gini"]
        for r in df.groupBy("g").agg(gini_udaf(F.col("v")).alias("gini")).collect()
    }
    assert udaf["z"] == 0.0  # all-zero total guarded, no div-by-zero
    assert udaf["n"] == 0.0  # null-only group drops to empty → 0
