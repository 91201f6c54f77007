"""Driver-parity gate: run every oracle query under a PLAIN SparkSession.

The round-1 driver gate lost 13 queries to a conf the engine's own
session set but the external harness's did not (nanosAsLong). This tool
guards that class of defect: it builds a SparkSession with NO engine
defaults (default timezone handling, 200 shuffle partitions, no Arrow,
default broadcast threshold) — the worst-case external harness — and
runs the full DuckDB-oracle comparison. Any conf a query's correctness
depends on must therefore be set at READ/RUN time inside the engine
(sources/io.py pins nanosAsLong + UTC), never only in session.py.

Usage: python tools/driver_parity.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-parity")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as entrymod
    import tools.check as c

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    fails: list[tuple[str, str]] = []
    for name, orc in oracles.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sc_, sr = c.canon_rows(qs[name](spark, sf_dir).toPandas())
            oc_, orows = c.canon_rows(con.execute(orc).fetchdf())
            ok = (sc_ == oc_) and (sr == orows)
            why = "value/schema mismatch"
        except Exception as e:  # noqa: BLE001
            ok, why = False, repr(e)[:200]
        if ok:
            n_pass += 1
            print(f"PASS  {name} ({time.time() - t0:.1f}s)")
        else:
            n_fail += 1
            fails.append((name, why))
            print(f"FAIL  {name}: {why}")
    print(f"\n{n_pass} pass, {n_fail} fail (plain-session parity)")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
