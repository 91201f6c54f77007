"""Independent-reference checks for the mining/forecasting roster.

The DuckDB oracles prove cross-engine agreement; these tests prove the
SEMANTICS against third implementations: pure-Python recurrences for the
Holt and clamped-balance folds, statsmodels-free Holt math, a dict-BFS
for the reachability levels, and brute-force candidate generation for
the grid kNN. Plus a canary for the DuckDB 1.0 ``list_reduce`` +
``struct_pack`` accumulator bug that forced the list-accumulator oracle
encoding (roster_mining module docstring): if a DuckDB upgrade fixes the
struct binding, this test starts failing and the workaround note can be
revisited.
"""

from __future__ import annotations

import duckdb
import pytest

from review_engine_spark.plans.roster_mining import (
    q_bfs_levels,
    q_bom_rollup,
    q_geo_knn,
    q_holt_linear,
    q_inventory_balance,
)
from review_engine_spark.sources.io import read_parquet_table


def test_duckdb_struct_fold_still_broken():
    """DuckDB 1.0 resolves ``acc.field`` inconsistently across steps of a
    struct-accumulator list_reduce (correct answer here: l=11, b=105 —
    the list-accumulator form returns it, the struct form does not)."""
    con = duckdb.connect()
    lst = con.execute(
        """
        SELECT list_reduce([[CAST(1 AS DOUBLE), CAST(100 AS DOUBLE)],
                            [CAST(2 AS DOUBLE), CAST(200 AS DOUBLE)],
                            [CAST(3 AS DOUBLE), CAST(300 AS DOUBLE)]],
         (acc, x) -> [acc[1] * 2 + x[1], acc[2] + acc[1]])
        """
    ).fetchone()[0]
    assert lst == [11.0, 105.0]
    st = con.execute(
        """
        SELECT list_reduce(
          [struct_pack(l:=CAST(1 AS DOUBLE), b:=CAST(100 AS DOUBLE)),
           struct_pack(l:=CAST(2 AS DOUBLE), b:=CAST(200 AS DOUBLE)),
           struct_pack(l:=CAST(3 AS DOUBLE), b:=CAST(300 AS DOUBLE))],
          (acc, x) -> struct_pack(l := acc.l * 2 + x.l, b := acc.b + acc.l))
        """
    ).fetchone()[0]
    assert st["l"] == 11.0
    if st["b"] == 105.0:
        pytest.fail(
            "DuckDB fixed the struct-accumulator list_reduce binding — "
            "the list-encoding workaround in roster_mining oracles can "
            "be revisited (it stays correct either way)"
        )


def _events_seq(spark, sf_dir):
    pdf = (
        read_parquet_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    return pdf.groupby("user_id")["value"].apply(list)


def test_holt_linear_matches_python_recurrence(spark, sf_dir):
    got = {
        r["user_id"]: (r["level"], r["trend"], r["forecast_3"])
        for r in q_holt_linear(spark, sf_dir).collect()
    }
    for uid, vs in _events_seq(spark, sf_dir).items():
        lvl, b = vs[0], 0.0
        for x in vs[1:]:
            l_new = 0.2 * x + 0.8 * (lvl + b)
            b = 0.1 * (l_new - lvl) + 0.9 * b
            lvl = l_new
        # identical IEEE op sequence on both sides -> exact equality
        assert got[uid] == (lvl, b, lvl + 3 * b), uid


def test_inventory_balance_matches_python_replay(spark, sf_dir):
    got = {
        r["p_partkey"]: (r["n_moves"], r["end_balance"], r["stockouts"])
        for r in q_inventory_balance(spark, sf_dir).collect()
    }
    li = (
        read_parquet_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber",
            "l_returnflag", "l_quantity",
        )
        .toPandas()
        .sort_values(["l_partkey", "l_shipdate", "l_orderkey", "l_linenumber"])
    )
    for pk, grp in li.groupby("l_partkey"):
        bal = so = n = 0
        for rf, q in zip(grp["l_returnflag"], grp["l_quantity"]):
            d = int(q) if rf == "R" else -int(q)
            if bal + d < 0:
                so += 1
            bal = max(0, bal + d)
            n += 1
        assert got[pk] == (n, bal, so), pk


def test_bfs_levels_matches_dict_bfs(spark, sf_dir):
    from collections import deque

    from review_engine_spark.plans.roster_mining import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).collect()
    adj: dict[int, set[int]] = {}
    for r in edges:
        adj.setdefault(r["u"], set()).add(r["v"])
    src = min(adj)
    lvl = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        if lvl[u] >= 8:
            continue
        for v in adj.get(u, ()):
            if v not in lvl:
                lvl[v] = lvl[u] + 1
                dq.append(v)
    got = {r["node"]: r["lvl"] for r in q_bfs_levels(spark, sf_dir).collect()}
    assert got == lvl


def test_geo_knn_is_true_knn_within_neighborhood(spark, sf_dir):
    """Each reported neighbor list must equal brute-force top-3 among the
    3x3-cell candidates (per-cell cap never binds at sf0.001)."""
    rows = q_geo_knn(spark, sf_dir).collect()
    pts = {}
    cust = read_parquet_table(spark, sf_dir, "customer").select("c_custkey").toPandas()
    for k in cust["c_custkey"]:
        k = int(k)
        xi, yi = k * 48271 % 180000, k * 16807 % 360000
        pts[k] = (xi, yi, xi // 7500, yi // 7500)
    got: dict[int, list[tuple]] = {}
    for r in rows:
        got.setdefault(r["src"], []).append((r["rn"], r["nbr"], r["d2"]))
    for src, (xi, yi, cx, cy) in pts.items():
        cand = [
            ((xi - x2) ** 2 + (yi - y2) ** 2, k2)
            for k2, (x2, y2, cx2, cy2) in pts.items()
            if k2 != src and abs(cx2 - cx) <= 1 and abs(cy2 - cy) <= 1
        ]
        want = sorted(cand)[:3]
        have = sorted(got.get(src, []))
        assert [(d, k) for d, k in want] == [(d2, n) for _, n, d2 in have], src


def test_bom_rollup_root_totals(spark, sf_dir):
    """The root (node 1) subtree covers every part — including partkey 0,
    which only joins the tree because nodes are partkey+1 — so its
    rollup must equal the whole-table revenue and part count."""
    out = {r["node"]: r for r in q_bom_rollup(spark, sf_dir).collect()}
    li = read_parquet_table(spark, sf_dir, "lineitem").toPandas()
    cents = (
        (li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5)
        .apply(int)  # floor for positive values
        .groupby(li["l_partkey"] + 1)
        .sum()
    )
    assert out[1]["subtree_cents"] == int(cents.sum())
    assert out[1]["n_members"] == li["l_partkey"].nunique()
    # spot-check an interior node: subtree = k and k's descendants
    k = 6
    members = [p for p in cents.index if any(p >> g == k for g in range(0, 40))]
    assert out[k]["n_members"] == len(members)
    assert out[k]["subtree_cents"] == int(cents.loc[members].sum())


def test_holt_winters_matches_python_recurrence(spark, sf_dir):
    """Third-implementation check of the triple-exponential fold: a
    pure-Python replay over the same per-type daily cent series must
    match the engine EXACTLY (identical IEEE op sequence)."""
    import math

    from review_engine_spark.plans.roster_mining import q_holt_winters

    got = {
        r["event_type"]: (r["n_days"], r["level"], r["trend"], r["forecast_1"])
        for r in q_holt_winters(spark, sf_dir).collect()
    }
    ev = (
        read_parquet_table(spark, sf_dir, "events")
        .select("event_type", "ts", "value")
        .toPandas()
    )
    ev["day"] = ev["ts"].dt.floor("D")
    ev["cents"] = (ev["value"] * 100 + 0.5).map(math.floor)
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    )
    daily["dow"] = (daily["day"].dt.dayofweek + 1) % 7  # Sunday=0 convention
    for et, grp in daily.sort_values("day").groupby("event_type"):
        rows = list(zip(grp["dow"], grp["cents"].astype(float)))
        dow0, x0 = rows[0]
        l, b, s = x0, 0.0, [0.0] * 7
        last_dow = dow0
        for dow, x in rows[1:]:
            lp = 0.3 * (x - s[int(dow)]) + 0.7 * (l + b)
            b = 0.1 * (lp - l) + 0.9 * b
            s[int(dow)] = 0.2 * (x - lp) + 0.8 * s[int(dow)]
            l = lp
            last_dow = dow
        season_next = s[int(last_dow + 1) % 7]
        assert got[et] == (len(rows), l, b, l + b + season_next), et


def test_adamic_adar_exact_weights_and_tie_break(spark, tmp_path):
    """Tiny co-purchase graph with hand-computed micro-unit scores:
    shared deg-2 part weighs 1442695, deg-3 part 910239; a degree-1
    part contributes nothing (outside the [2, 20] blocking band)."""
    import pandas as pd
    from review_engine_spark.plans.roster_mining import q_adamic_adar

    # one order per (user, part): users 1,2 share parts 500 (deg 2) and
    # 501 (deg 3); user 3 shares only 501; part 502 is user-1-only
    rows = [
        (1, 500), (1, 501), (1, 502),
        (2, 500), (2, 501),
        (3, 501),
    ]
    pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [u for u, _ in rows],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        {
            "l_orderkey": range(1, len(rows) + 1),
            "l_partkey": [p for _, p in rows],
        }
    ).to_parquet(tmp_path / "lineitem.parquet")

    out = {
        (r["user_id"], r["partner_id"]): (
            r["n_common"], r["aa_micro"], r["rank"]
        )
        for r in q_adamic_adar(spark, str(tmp_path)).collect()
    }
    w2, w3 = 1_442_695, 910_239
    assert out[(1, 2)] == (2, w2 + w3, 1)
    assert out[(1, 3)] == (1, w3, 2)
    assert out[(2, 1)] == (2, w2 + w3, 1)
    assert out[(2, 3)] == (1, w3, 2)
    # user 3 ties partners 1 and 2 at w3 -> id tie-break orders them
    assert out[(3, 1)] == (1, w3, 1)
    assert out[(3, 2)] == (1, w3, 2)
    assert len(out) == 6


def test_kcore_peels_periphery_and_keeps_clique(spark, tmp_path):
    """K4 clique survives the 3-core; a pendant user and an isolated
    pair peel away (and the clique's degrees exclude peeled edges)."""
    import pandas as pd
    from review_engine_spark.plans.roster_mining import q_kcore

    # one order per (user, part): parts 900.. give each K4 pair a
    # shared part (buyer count 2, inside the [2,20] band); part 910
    # attaches pendant user 5 to user 1; part 911 links the 6-7 pair
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    rows = []
    for i, (a, b) in enumerate(pairs):
        rows += [(a, 900 + i), (b, 900 + i)]
    rows += [(1, 910), (5, 910), (6, 911), (7, 911)]
    pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [u for u, _ in rows],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        {
            "l_orderkey": range(1, len(rows) + 1),
            "l_partkey": [p for _, p in rows],
        }
    ).to_parquet(tmp_path / "lineitem.parquet")

    out = {
        r["user_id"]: r["core_degree"]
        for r in q_kcore(spark, str(tmp_path)).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_adamic_adar_weight_table_matches_ln_definition():
    import math

    from review_engine_spark.plans.roster_mining import _AA_W_MICRO

    assert _AA_W_MICRO == [round(1e6 / math.log(d)) for d in range(2, 21)]


def test_pack_pair_guards_overflow_and_roundtrips(spark):
    """The packed-BIGINT pair key is injective only for u < 2^31,
    v < 2^32 (ADVICE r10: TPC-H custkeys exceed 2^31 at SF ~30k+). The
    guard must FAIL the job on out-of-range ids instead of silently
    corrupting pairs, and in-range packs must round-trip exactly."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from review_engine_spark.functions.packing import pack_pair, unpack_pair

    ok = spark.createDataFrame(
        [(2**31 - 1, 2**32 - 1), (0, 0), (123456789, 987654321)],
        "u long, v long",
    ).select(pack_pair(F.col("u"), F.col("v")).alias("uu"), "u", "v")
    u_dec, v_dec = unpack_pair("uu")
    for r in ok.select(
        "u", "v", u_dec.alias("u2"), v_dec.alias("v2")
    ).collect():
        assert (r["u"], r["v"]) == (r["u2"], r["v2"])

    for bad_u, bad_v in [(2**31, 0), (-1, 0), (0, 2**32), (0, -1)]:
        bad = spark.createDataFrame(
            [(bad_u, bad_v)], "u long, v long"
        ).select(pack_pair(F.col("u"), F.col("v")).alias("uu"))
        with _pytest.raises(Exception, match="pack_pair overflow"):
            bad.collect()
