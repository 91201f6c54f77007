"""Measure the stateful state-layout crossover vs TOUCHED-KEY fraction
(VERDICT r9 item 1).

Round 9 made the key-coarsened GroupState layout the default for the
stateful runners after it beat the ~3 ms/key plumbing floor on BULK
ingest (every micro-batch touches ~every key). Its own docstring
flagged the opposite regime: a trickle stream touching few keys per
batch re-serializes each touched bucket's WHOLE parallel-array state,
so the coarse layout might lose where per-key only pays for the keys
actually present. This harness measures that claim instead of assuming
it.

Method: the K=100 stress replica (10M events, 150k users) is
re-clustered into G user-range files via ``repartitionByRange(G,
user_id)``; streaming it with ``maxFilesPerTrigger=1`` yields G
micro-batches each touching ~150k/G distinct users — touched fraction
f ≈ 1/G per batch — while total event volume, total key count, and the
final state size stay IDENTICAL across arrangements. The random 32-file
replica is the f≈100%% bulk baseline. Per arrangement, the ewma runner
(the family's cheapest fold — layout cost dominates) runs under every
layout in --kb; the decision signal is the per-arrangement ratio, since
both layouts see the identical stream.

Caveat this method accepts: a range-clustered batch delivers each
user's whole history at once (bulk-backfill-by-key-range), whereas a
production trickle delivers few events per touched key repeatedly. The
touched-FRACTION dimension — the one the docstring's concern is about —
is exercised exactly; the per-key event volume is not, and the fold
loop was measured ~free in r8 (1.5 s / 10M events), so it cannot hide a
layout crossover.

Usage:
    STRESS_DIR=/tmp/stress100 python tools/profile_trickle.py \
        [--groups 10,100,1000] [--kb none,auto,4096]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TRICKLE_DIR = "/tmp/trickle"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("STRESS_DIR", "/tmp/stress100")
    )
    ap.add_argument("--groups", default="10,100")
    ap.add_argument("--kb", default="none,auto,4096")
    args = ap.parse_args()

    from review_engine_spark.session import get_spark
    from review_engine_spark.streaming import jobs

    os.environ["SPARK_GRAFT_STREAM_SINK"] = "files"
    os.environ["SPARK_GRAFT_STATE_PARTITIONS"] = "32"
    spark = get_spark(
        "profile-trickle",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )

    src = os.path.join(args.sf_dir, "events.parquet")
    groups = [int(g) for g in args.groups.split(",")]

    def clustered_dir(g: int) -> str:
        out = os.path.join(TRICKLE_DIR, f"g{g}", "events.parquet")
        if os.path.isdir(out) and any(
            f.endswith(".parquet") for f in os.listdir(out)
        ):
            return os.path.dirname(out)
        print(f"# building {out} ...", flush=True)
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        (
            spark.read.parquet(src)
            .repartitionByRange(g, "user_id")
            .write.mode("overwrite")
            .parquet(out)
        )
        return os.path.dirname(out)

    def kb_val(s: str):
        if s == "none":
            return None
        if s == "auto":
            return "auto"
        return int(s)

    kbs = [kb_val(s) for s in args.kb.split(",")]

    def timed(label: str, fn) -> float:
        t0 = time.perf_counter()
        out = fn()
        n = out.count()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f} s ({n} rows)", flush=True)
        return dt

    # f ~= 100% baseline: the random replica, one of its 32 files/batch
    cases = [("random(f~100%)", args.sf_dir)]
    cases += [(f"g{g}(f~{100.0 / g:g}%)", clustered_dir(g)) for g in groups]

    results: dict[str, dict[str, float]] = {}
    for label, d in cases:
        print(f"\n## {label}  [{d}]", flush=True)
        row: dict[str, float] = {}
        for kb in kbs:
            name = "per-key" if kb is None else f"kb={kb}"
            row[name] = timed(
                f"ewma {name:<8}",
                lambda kb=kb, d=d: jobs.run_ewma_stateful(
                    spark, d, key_buckets=kb, max_files_per_trigger=1
                ),
            )
        results[label] = row

    print("\n## crossover table (total s; per-arrangement ratios decide)")
    names = list(next(iter(results.values())))
    print("arrangement      " + "  ".join(f"{n:>10}" for n in names))
    for label, row in results.items():
        print(
            f"{label:<16} "
            + "  ".join(f"{row[n]:>10.1f}" for n in names)
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
