"""Per-stage profile of q_als_recommend at fixture vs 100× stress scale
(VERDICT r8 item 5: the spot-chunk's 161.7× total sits 1.6× above the
Ω(users)=100× output floor — name which stage carries the residual).

Stages (the operator's real seams — probe/rerank/top-k are ONE fused
Arrow pass by design, so they profile as one):

  A ratings     — implicit_ratings(orders, lineitem), materialized
  B als fit     — MLlib ALS (implicitPrefs), forced via factor counts
  C ann score   — _ann_topk_from_factors end-to-end (driver index
                  build + fused probe/exact-rerank/top-k mapInPandas),
                  materialized through the noop sink
  C1 item pull  — item-factor driver collect alone (the index input —
                  isolates driver-pull from executor probe time)

Usage:
    STRESS_DIR=/tmp/stress100 python tools/profile_als.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    from review_engine_spark.operators import recommend as rec
    from review_engine_spark.session import get_spark
    from review_engine_spark.sources.io import read_parquet_table

    stress = os.environ.get("STRESS_DIR", "/tmp/stress100")
    spark = get_spark(
        "profile-als",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"  {label}: {dt:.1f} s", flush=True)
        return out, dt

    for sf_dir in ("/root/testdata/sf0.1", stress):
        print(f"## {sf_dir}", flush=True)
        ratings, t_a = timed(
            "A ratings  ",
            lambda: rec.implicit_ratings(
                read_parquet_table(spark, sf_dir, "orders"),
                read_parquet_table(spark, sf_dir, "lineitem"),
            ).persist(),
        )
        n = ratings.count()
        print(f"    ({n} ratings)", flush=True)

        def fit():
            m = rec._fit_als(
                ratings, 8, 5, 0.1, 1.0, 42, None,
                "user_id", "item_id", "rating",
            )
            m.userFactors.persist().count()
            m.itemFactors.persist().count()
            return m

        model, t_b = timed("B als fit  ", fit)
        _, t_c1 = timed(
            "C1 item pull", lambda: model.itemFactors.collect()
        )
        _, t_c = timed(
            "C ann score",
            lambda: rec._ann_topk_from_factors(
                spark, model.userFactors, model.itemFactors, 5,
                "user_id", "item_id", 42,
            )
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        total = t_a + t_b + t_c
        print(
            f"  total A+B+C: {total:.1f} s "
            f"(fit {100 * t_b / total:.0f}%, score {100 * t_c / total:.0f}%)",
            flush=True,
        )
        ratings.unpersist()
        model.userFactors.unpersist()
        model.itemFactors.unpersist()
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
