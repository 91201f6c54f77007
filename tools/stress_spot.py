"""100×-dossier regression spot-check (VERDICT r7 item 7).

The SCALING.md dossier measured every roster query at a true 100×
input, but those numbers silently rot as plans change. This tool
re-measures a NAMED set of queries (the ones whose plans changed this
round) against the reusable K=100 replica and diffs each fresh ratio
against the recorded one in tools/scaling_ratios.json.

A query REGRESSES if its fresh 100× ratio exceeds
``max(recorded * TOL_FACTOR, recorded + TOL_ABS)`` — the factor absorbs
run-to-run noise on big ratios, the absolute floor keeps 1.x-ratio
queries from flagging on ±1 s jitter. A regression exits non-zero so
the round's NOTES must either fix the plan or re-record the ratio (and
update the registry) with a named cause.

Usage:
    STRESS_DIR=/tmp/stress100 python tools/stress_spot.py q_a q_b ...

The replica must already exist (tools/stress_tpch.py builds it); this
tool never replicates — spot checks must stay cheap enough to run every
round.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"
TOL_FACTOR = 1.5
TOL_ABS = 5.0


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: stress_spot.py q_name [q_name ...]", file=sys.stderr)
        return 2
    stress_dir = os.environ.get("STRESS_DIR", "/tmp/stress100")
    marker = Path(stress_dir, "SALT_VERSION")
    if not marker.exists():
        print(
            f"no replica at {stress_dir} (SALT_VERSION missing) — build it "
            "first: STRESS_DIR=... python tools/stress_tpch.py 100",
            file=sys.stderr,
        )
        return 2

    ratios_path = REPO / "tools" / "scaling_ratios.json"
    recorded = {
        k: v
        for k, v in json.loads(ratios_path.read_text()).items()
        if not k.startswith("_")
    }

    import __spark_entry__ as entrymod
    from review_engine_spark.session import get_spark

    spark = get_spark(
        "stress-spot",
        shuffle_partitions=min(1024, 32 * 25),
        extra_conf={"spark.driver.memory": "24g"},
    )
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    failed = []
    for name in names:
        fn = qs[name]
        t = {}
        for sf_dir in (SF_DIR, stress_dir):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            t[sf_dir] = best
            spark.catalog.clearCache()
        ratio = t[stress_dir] / max(t[SF_DIR], 1e-9)
        base = recorded.get(name)
        if base is None:
            verdict = "NO-BASELINE (record it in scaling_ratios.json)"
        else:
            limit = max(base * TOL_FACTOR, base + TOL_ABS)
            if ratio > limit:
                verdict = f"REGRESSED (recorded {base}x, limit {limit:.1f}x)"
                failed.append(name)
            else:
                verdict = f"ok (recorded {base}x)"
        print(
            f"{name}: {t[SF_DIR]:.2f}s -> {t[stress_dir]:.2f}s = "
            f"{ratio:.1f}x  {verdict}",
            flush=True,
        )
    if failed:
        print(f"# REGRESSIONS: {' '.join(failed)}")
        return 1
    print("# spot check clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
