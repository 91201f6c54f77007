"""At-scale recall pin for semantic_dedup's SRP-blocked pair stage
(VERDICT r12 item 3): on a replica whose clusters EXCEED sub_target
(K=10 → ~20k embeddings, ~2.5k rows/cluster), run the exact expression
pair stage (sub_target forced huge) and the shipping SRP path, and
report dropped-set recall. The SRP drops must be a SUBSET of the exact
drops (any caught pair is a true pair; the greedy rule is monotone in
the pair set).

Usage:
    STRESS_DIR=/tmp/stress10 python tools/measure_semdedup_recall.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    stress_dir = os.environ.get("STRESS_DIR", "/tmp/stress10")
    if not Path(stress_dir, "SALT_VERSION").exists():
        print(f"no replica at {stress_dir}", file=sys.stderr)
        return 2

    from review_engine_spark.operators.curation import semantic_dedup
    from review_engine_spark.session import get_spark

    spark = get_spark(
        "semdedup-recall",
        shuffle_partitions=256,
        extra_conf={"spark.driver.memory": "24g"},
    )
    emb = spark.read.parquet(f"{stress_dir}/embeddings.parquet")
    n = emb.count()
    print(f"replica embeddings: {n} rows")

    def drops(sub_target: int) -> set:
        t0 = time.perf_counter()
        out = {
            r["vec_id"]
            for r in semantic_dedup(
                emb, "embedding", "vec_id", k=8, threshold=0.3,
                sub_target=sub_target,
            ).collect()
            if not r["keep"]
        }
        print(
            f"  sub_target={sub_target}: {len(out)} drops "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
        return out

    print("exact expression pair stage (sub_target=10^9):")
    exact = drops(10**9)
    print("shipping SRP path (sub_target=2048):")
    srp = drops(2048)

    extras = srp - exact
    missed = exact - srp
    recall = len(srp & exact) / max(len(exact), 1)
    print(f"\nexact drops: {len(exact)}")
    print(f"SRP drops:   {len(srp)}  (extras={len(extras)}, missed={len(missed)})")
    print(f"recall: {recall:.3f}")
    if extras:
        print(f"VIOLATION: SRP dropped ids not in exact set: {sorted(extras)[:10]}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
