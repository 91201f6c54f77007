"""The global-window plan rule is structural, not honor-system.

tools/plan_audit.py used to accept a bare ``Window.orderBy(...)`` if the
source line carried a "bounded" comment — silenceable by prose. The rule
now parses the final adaptive plan: a Window node with an empty
partition spec whose subtree scans a corpus leaf with no aggregate or
limit in between is a violation regardless of what the source says.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_audit import final_plan_only, global_window_violations  # noqa: E402


def _formatted(df):
    df.collect()  # finalize the adaptive plan before explaining
    return final_plan_only(
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    )


def test_unbounded_global_window_fires(spark, sf_dir):
    # the in-line comment marker that used to silence the source sweep
    w = Window.orderBy("p_retailprice")  # bounded
    bad = spark.read.parquet(f"{sf_dir}/part.parquet").withColumn(
        "r", F.row_number().over(w)
    )
    assert global_window_violations(_formatted(bad))


def test_rank_after_limit_passes(spark, sf_dir):
    top = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .orderBy(F.desc("p_retailprice"))
        .limit(5)
    )
    ok = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("p_retailprice")))
    )
    assert global_window_violations(_formatted(ok)) == []


def test_aggregate_fed_global_window_passes(spark, sf_dir):
    per_brand = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )
    ok = per_brand.withColumn("r", F.row_number().over(Window.orderBy("n", "p_brand")))
    assert global_window_violations(_formatted(ok)) == []


def test_partitioned_window_ignored(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet").withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("p_brand").orderBy("p_retailprice")
        ),
    )
    assert global_window_violations(_formatted(part)) == []
