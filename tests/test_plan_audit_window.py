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


def test_plan_fingerprint_stable_across_ids_and_stats(spark):
    """The fingerprint must be invariant to everything run-varying —
    node ids, expression ids, statistics annotations, AQE wrappers —
    so only a real tree-shape change can fire the canary."""
    from plan_audit import plan_fingerprint

    a = """== Physical Plan ==
AdaptiveSparkPlan (10)
+- == Final Plan ==
   ResultQueryStage (9)
   +- * HashAggregate (8)
      +- AQEShuffleRead (7)
         +- ShuffleQueryStage (6), Statistics(sizeInBytes=1.0 KiB, rowCount=2)
            +- Exchange (5)
               +- * HashAggregate (4)
                  +- * Project (3)
                     +- * Filter (2)
                        +- Scan parquet (1)

(1) Scan parquet
Output [2]: [a#1, b#2]
"""
    b = a.replace("#1", "#77").replace("#2", "#91")
    b = b.replace("(8)", "(18)").replace("(5)", "(15)")
    b = b.replace("sizeInBytes=1.0 KiB, rowCount=2", "sizeInBytes=9.9 MiB, rowCount=5")
    assert plan_fingerprint(a)[0] == plan_fingerprint(b)[0]
    # a structural change — an added Exchange — MUST change it
    c = a.replace(
        "+- * Project (3)",
        "+- Exchange (30)\n                     +- * Project (3)",
    )
    assert plan_fingerprint(a)[0] != plan_fingerprint(c)[0]


def test_check_fingerprints_flags_synthetic_mutation(tmp_path, monkeypatch):
    """End-to-end canary behavior: bootstrap is silent, an identical
    re-run is clean, a mutated plan is a violation naming the query,
    and --update-fingerprints acknowledges it."""
    import plan_audit

    monkeypatch.setattr(plan_audit, "REPO", tmp_path)
    (tmp_path / "tools").mkdir()
    plan = "+- * Project (3)\n   +- Scan parquet (1)\n"
    v, notes = plan_audit.check_fingerprints({"q_x": plan}, update=False)
    assert v == [] and any("bootstrapped" in n for n in notes)
    v, notes = plan_audit.check_fingerprints({"q_x": plan}, update=False)
    assert v == [] and notes == []
    mutated = "+- * Project (3)\n   +- Exchange (9)\n      +- Scan parquet (1)\n"
    v, _ = plan_audit.check_fingerprints({"q_x": mutated}, update=False)
    assert len(v) == 1 and "q_x" in v[0] and "Exchange" in v[0]
    v, notes = plan_audit.check_fingerprints({"q_x": mutated}, update=True)
    assert v == [] and any("acknowledged" in n for n in notes)
    v, _ = plan_audit.check_fingerprints({"q_x": mutated}, update=False)
    assert v == []


def test_fingerprint_capture_is_cache_state_independent(spark, sf_dir):
    """The round-10 contention flake, simulated: post-execution explains
    of a query with persisted subtrees interleave nested Initial-Plan
    markers inside materialized InMemoryRelation children, so the
    captured fingerprint varied with cache/AQE state (three distinct
    values across six same-session captures). The audit now captures
    the PRE-execution explain under a clean cache; this pins that the
    capture is identical before/after heavy cache pollution AND across
    repeated materializations of the same query."""
    import __spark_entry__ as em
    from plan_audit import plan_fingerprint

    qs = em.queries()

    def capture(name):
        spark.catalog.clearCache()  # the audit's per-query discipline
        df = qs[name](spark, sf_dir)
        raw = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        return plan_fingerprint(raw)[0]

    clean = capture("q_cooccur_topk")
    # pollute: materialize the query twice back-to-back (stacked cache
    # entries — the exact round-10 interference mechanism) and capture
    # again under the audit discipline
    qs["q_cooccur_topk"](spark, sf_dir).collect()
    qs["q_cooccur_topk"](spark, sf_dir).collect()
    assert capture("q_cooccur_topk") == clean
    assert capture("q_cooccur_topk") == clean
