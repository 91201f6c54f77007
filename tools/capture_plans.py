"""Capture `.explain("formatted")` for named roster queries into
plans/r14/<query>_<tag>.txt (the optimization round's before/after
evidence files — the judge checks plan claims against these).

Captures are PRE-execution (isFinalPlan=false) under a clean cache,
the plan-fingerprint convention (NOTES r11: never fingerprint a
post-execution adaptive print).

Usage: python tools/capture_plans.py before q_a q_b ...
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as entrymod
    from review_engine_spark.session import get_spark

    spark = get_spark("capture-plans")
    qs = entrymod.queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
