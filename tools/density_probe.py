"""Candidate-density probe for the round-13 adjudication (VERDICT r12
item 1 / next #1): explains WHERE the 100x wall time of
q_containment_dedup and q_stream_near_dup goes by counting the
intermediate cardinalities both plans are bounded by, at the fixture
and at the replica.

If the counters scale ~linearly with K (=100), the plans are linear and
the measured wall ratio is honest compute growth — the adjudication
records it with this probe as the named cause. If a counter grows
super-linearly, THAT stage is a real scale problem to fix.

Usage:
    python tools/density_probe.py /root/testdata/sf0.1 /tmp/stress100
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402


def containment_counters(spark, sf_dir: str) -> dict:
    """Replays q_containment_dedup's stages, counting each."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
    )
    base = docs.select("doc_id", toks.alias("toks")).withColumn(
        "nt", F.size("toks")
    )
    idx = F.when(
        F.col("nt") - 7 >= 1, F.sequence(F.lit(1), F.col("nt") - 7)
    ).otherwise(F.array().cast("array<int>"))
    sh = (
        base.select("doc_id", "toks", F.posexplode(idx).alias("_i", "pos"))
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.slice("toks", F.col("pos"), 8))).alias(
                "h"
            ),
        )
        .distinct()
    )
    sh = sh.persist()
    n_docs = docs.count()
    n_shingle_rows = sh.count()
    df_agg = sh.groupBy("h").agg(F.count("*").alias("df")).persist()
    n_distinct_shingles = df_agg.count()
    rare = df_agg.where(F.col("df").between(2, 20)).select("h")
    n_rare = rare.count()
    sa = sh.select(F.col("doc_id").alias("a"), "h")
    sb = sh.select(F.col("doc_id").alias("b"), "h")
    cand = (
        sa.join(rare.hint("shuffle_hash"), "h")
        .join(sb, "h")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    n_cand = cand.count()
    sh.unpersist()
    df_agg.unpersist()
    return {
        "n_docs": n_docs,
        "n_shingle_rows": n_shingle_rows,
        "n_distinct_shingles": n_distinct_shingles,
        "n_rare_band": n_rare,
        "n_candidate_pairs": n_cand,
    }


def near_dup_counters(
    spark, sf_dir: str, n_seeds: int = 8, band_width: int = 2
) -> dict:
    """Replays q_stream_near_dup's md5 banding batch-side (the exact
    expressions of streaming/jobs.py run_stream_near_dup), counting the
    bucket state the GroupState runner must hold."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    sh = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
            F.element_at(F.col("toks"), i + 3),
        ),
    )

    def _seed_hash(seed: int):
        def h(x):
            return F.md5(F.concat(F.lit(f"{seed}|"), x))

        return h

    n_bands = n_seeds // band_width
    sigs = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            *[
                F.array_min(F.transform(sh, _seed_hash(s))).alias(f"sig{s}")
                for s in range(n_seeds)
            ],
        )
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"sig{b * band_width + j}")
                        for j in range(band_width)
                    ],
                )
            ).alias("bh"),
        )
        for b in range(n_bands)
    ]
    bands = (
        sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("b"))
        .select("doc_id", "b.band_idx", "b.bh")
        .persist()
    )
    n_band_rows = bands.count()
    n_occupied = bands.select("band_idx", "bh").distinct().count()
    bands.unpersist()
    return {
        "n_docs": docs.count(),
        "n_band_rows": n_band_rows,
        "n_occupied_buckets": n_occupied,
        "n_dup_band_rows": n_band_rows - n_occupied,
    }


def main() -> int:
    from review_engine_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/stress100"]
    spark = get_spark(
        "density-probe",
        shuffle_partitions=min(1024, 32 * 25),
        extra_conf={"spark.driver.memory": "24g"},
    )
    report = {}
    for d in dirs:
        report[d] = {
            "containment": containment_counters(spark, d),
            "near_dup": near_dup_counters(spark, d),
        }
        print(json.dumps({d: report[d]}), flush=True)
    if len(dirs) == 2:
        a, b = dirs
        ratios = {}
        for fam in ("containment", "near_dup"):
            for k, v in report[a][fam].items():
                w = report[b][fam].get(k)
                if (
                    isinstance(v, (int, float))
                    and isinstance(w, (int, float))
                    and v
                ):
                    ratios[f"{fam}.{k}"] = round(w / v, 2)
        print(json.dumps({"ratios_b_over_a": ratios}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
