"""Second-seed fixture generator (verdict r6 item 4).

Regenerates the driver's synthetic star schema — same schemas, same
row-count formulas, same value ranges/cardinalities — from a DIFFERENT
seed, so the full oracle gate can be re-run on data the roster's
constants were never tuned against. A constant silently fit to the
driver fixture (a similarity threshold that only separates THIS
corpus, a bucket count that only balances THIS key histogram) passes
`tools/check.py` on /root/testdata forever; it fails here.

Schema/shape contract (measured from /root/testdata, TESTDATA.md):
  region 5 | nation 25 | customer 150k*sf | supplier 10k*sf
  part 200k*sf | orders 1.5M*sf | lineitem ~6M*sf (1-7 lines/order)
  events 1M*sf over 30 days, users = customers
  documents max(500, 50k*sf) word-soup, 5 langs, 20 sources
  embeddings max(500, 20k*sf) unit-norm 64-dim, labels 0-9
Timestamps are written as parquet TIMESTAMP(MICROS, NTZ) to match the
driver's round-3+ layout (NOTES.md) so `read_parquet_table`'s NTZ
normalization path is exercised identically.

Usage: python tools/gen_fixture.py OUT_DIR [SF] [SEED]
       python tools/check.py OUT_DIR          # the actual sweep
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
PTYPES = ["ECONOMY", "SMALL", "MEDIUM", "LARGE", "PROMO", "STANDARD"]
COLORS = ["red", "blue", "green", "small", "big", "dark", "light", "pale"]
NOUNS = ["widget", "bolt", "ring", "gear", "cog", "pin", "rod", "cap"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark a "
    "the line sort window order data column join small customer query big "
    "group stream filter vector"
).split()

DAY_US = 86_400_000_000


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def main() -> int:
    out = Path(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 20260815
    rng = np.random.RandomState(seed)
    out.mkdir(parents=True, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    def w(name: str, table: pa.Table) -> None:
        pq.write_table(table, out / f"{name}.parquet")

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(0, 10_000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.randint(0, 5, n_cust)],
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))
    w("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{COLORS[a]} {NOUNS[b]}"
            for a, b in zip(rng.randint(0, 8, n_part), rng.randint(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.randint(0, 25, n_part)],
        "p_type": [PTYPES[i] for i in rng.randint(0, 6, n_part)],
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 1),
    }))

    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    span = np.datetime64("2001-08-02", "us").astype(np.int64) - base
    odate_us = base + (rng.randint(0, span // DAY_US, n_ord)) * DAY_US
    w("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [("P", "F", "O")[i] for i in rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_col(odate_us),
        "o_orderpriority": [PRIORITIES[i] for i in rng.randint(0, 5, n_ord)],
    }))

    # ~4 lines/order, 1-7 each, linenumber 1..k — same shape as the
    # driver fixture (avg 4.0, max 7).
    lines_per = rng.randint(1, 8, n_ord)
    l_okey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_okey)
    l_lineno = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    qty = rng.randint(1, 51, n_li).astype(np.float64)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(l_okey, pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_lineno, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 1100, n_li), 2),
        "l_discount": np.round(rng.randint(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) * 0.01, 2),
        "l_returnflag": [("A", "N", "R")[i] for i in rng.randint(0, 3, n_li)],
        "l_linestatus": [("F", "O")[i] for i in rng.randint(0, 2, n_li)],
        "l_shipdate": _ts_col(
            np.repeat(odate_us, lines_per)
            + rng.randint(1, 121, n_li) * DAY_US
        ),
    }))

    ev_base = np.datetime64("2024-01-01", "us").astype(np.int64)
    ev_us = np.sort(ev_base + rng.randint(0, 30 * DAY_US, n_ev))
    w("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_col(ev_us),
        "user_id": pa.array(rng.randint(0, n_cust, n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.randint(0, 5, n_ev)],
        "value": np.round(rng.exponential(30, n_ev) + 0.01, 2),
        "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, n_ev)],
    }))

    texts = [
        " ".join(VOCAB[i] for i in rng.randint(0, len(VOCAB), rng.randint(10, 100)))
        for _ in range(n_doc)
    ]
    w("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, n_doc, p=[0.44, 0.14, 0.14, 0.14, 0.14])],
        "source": [f"src{i}" for i in rng.randint(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    X = rng.standard_normal((n_emb, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    w("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in X], pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_emb), pa.int32()),
    }))
    print(f"wrote sf={sf} seed={seed} -> {out} (lineitem {n_li} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
