"""All-roster duplicate-scan sweep (round-13 method, regenerated for r14).

For every declared query, build the DataFrame, print the INITIAL
physical plan (isFinalPlan=false, pre-execution), and count how many
times each base parquet table is scanned in the operator tree. A table
scanned more than once marks the query a multi-pass candidate for the
checkpoint adjudication protocol (OPTIMIZATION_r13 "rank-cutoff gates"
entry): at 100 TB a duplicated corpus subtree is a full extra pass,
while at fixture scale runtime exchange reuse often hides it — so
candidates go to the 100x replica for a paired A/B, never judged on
the initial-plan count alone.

Caveat recorded in r13: initial-plan scan counts OVERSTATE runtime
duplication wherever duplicated branches are byte-identical (runtime
exchange reuse dedups them); the sweep is a candidate finder only.

Usage: python tools/dup_scan_sweep.py [out.json]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"

_SCAN_RE = re.compile(r"FileScan parquet[^\n]*?/(\w+)\.parquet")


def main() -> int:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else None

    import __spark_entry__ as entrymod
    from review_engine_spark.session import get_spark

    spark = get_spark("dup-scan-sweep")
    qs = entrymod.queries()
    result: dict[str, dict[str, int]] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        spark.catalog.clearCache()
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "simple"
            )
        except Exception as e:  # noqa: BLE001 — sweep must finish
            errors[name] = repr(e)[:200]
            continue
        # Simple mode prints each FileScan once with its Location inline,
        # so per-table counts are exact (formatted mode repeats each scan
        # in the details section — the r13 double-counting convention).
        counts: dict[str, int] = {}
        for m in _SCAN_RE.finditer(plan):
            t = m.group(1)
            counts[t] = counts.get(t, 0) + 1
        dups = {t: c for t, c in counts.items() if c > 1}
        if dups:
            result[name] = dups
    spark.stop()

    print(f"{len(result)} queries with a table scanned >1x in the initial plan:")
    for name in sorted(result, key=lambda n: -max(result[n].values())):
        print(f"  {name}: {result[name]}")
    if errors:
        print(f"errors ({len(errors)}): {errors}")
    if out_path:
        out_path.write_text(json.dumps(result, indent=1, sort_keys=True))
        print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
