"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at a given SF dir,
runs the matching ``oracle_sql()`` under DuckDB on the same parquet views,
and compares row-count + column names + order-insensitive values. Stricter
than the driver in one way: values are compared exactly (post in-query
rounding), so a pass here should imply a driver pass.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    import datetime

    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (np.floating,)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(canon_cell(x) for x in v)
    if isinstance(v, pd.NaT.__class__):
        return None
    return v


def canon_rows(df):
    """pandas DataFrame → sorted list of tuples with columns sorted by name."""
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from review_engine_spark.session import get_spark

    spark = get_spark("check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        scols, srows = canon_rows(sdf)
        ocols, orows = canon_rows(odf)
        ok = True
        msgs = []
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount {len(srows)} vs {len(orows)}")
        if scols != ocols:
            ok = False
            msgs.append(f"cols {scols} vs {ocols}")
        # Driver-hazard replication: the harness canonicalizer hashes raw
        # pandas values, so (a) a list/ndarray cell crashes its sort, and
        # (b) an int64-vs-float64 dtype split hash-mismatches even when
        # values are numerically equal. Flag both as failures here.
        if ok:
            import decimal as _decimal

            for frame, side in ((sdf, "spark"), (odf, "oracle")):
                if not len(frame):
                    continue
                for c in frame.columns:
                    cell = frame[c].iloc[0]
                    if isinstance(cell, (list, tuple)) or type(cell).__name__ == "ndarray":
                        ok = False
                        msgs.append(
                            f"{side} returns array cells in '{c}' (driver canonicalizer would crash)"
                        )
                        break
                    # Decimal == float compares NUMERICALLY in Python, so a
                    # DecimalType output passed this gate in r4 while the
                    # driver's dtype-sensitive hash failed it (q_mann_whitney,
                    # r5's one red). Any Decimal cell is a hard failure.
                    if isinstance(cell, _decimal.Decimal):
                        ok = False
                        msgs.append(
                            f"{side} returns decimal.Decimal in '{c}' (driver value-hash "
                            f"would differ; CAST to DOUBLE / use 2e0 literals)"
                        )
                        break
                if not ok:
                    break
        # Driver-hazard replication: the harness compares the DuckDB result
        # TYPE against the Spark schema before hashing, while canon_cell
        # below strips tzinfo. A DuckDB `to_timestamp(...)` (TIMESTAMP WITH
        # TIME ZONE) vs Spark TimestampType mismatch passed here but failed
        # the driver in r02/r03 (q_hop_window, q_stream_tumbling). Flag any
        # tz-awareness split between the two sides as a hard failure.
        if ok:
            import pandas as _pd

            for c in sdf.columns:
                stz = isinstance(sdf[c].dtype, _pd.DatetimeTZDtype)
                otz = isinstance(odf[c].dtype, _pd.DatetimeTZDtype)
                if stz != otz:
                    ok = False
                    msgs.append(
                        f"timezone-awareness mismatch on '{c}': spark={sdf[c].dtype} "
                        f"oracle={odf[c].dtype} (driver schema compare would fail; "
                        f"CAST oracle to TIMESTAMP for NTZ)"
                    )
        if ok and len(sdf) and len(odf):
            num = {"i", "u", "f"}
            for c in sdf.columns:
                sk, okind = sdf[c].dtype.kind, odf[c].dtype.kind
                # object-vs-numeric is a driver hash mismatch too (e.g. a
                # Decimal column on one side): treat it like a kind split.
                if sk != okind and (
                    (sk in num and okind in num)
                    or (sk == "O") != (okind == "O")
                ):
                    ok = False
                    msgs.append(
                        f"dtype kind mismatch on '{c}': spark={sdf[c].dtype} "
                        f"oracle={odf[c].dtype} (driver value-hash would differ)"
                    )
        if ok and srows != orows:
            ok = False
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
            )
            msgs.append(f"first diff row {diff[0]}: spark={diff[1]} oracle={diff[2]}")
        if ok:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
            failures.append(name)

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
