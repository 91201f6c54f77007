"""Independent-reference checks for the warehouse-classics roster.

The DuckDB oracles prove cross-engine agreement; these tests prove the
SEMANTICS against third implementations: pure-Python sweeps/streak
counters for the sequence operators, pandas rank() for Mann-Whitney,
and numpy lstsq for the normal-equations OLS.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import timedelta

import numpy as np
import pandas as pd

from review_engine_spark.plans.roster_warehouse import (
    q_attribution,
    q_interval_merge,
    q_resource_allocation,
    q_robust_zscore,
    q_spend_deciles,
    q_survival_km,
    q_winsorize,
    q_concurrency,
    q_gap_islands,
    q_mann_whitney,
    q_ols_regression,
    q_path_topk,
    q_rolling_active,
    q_scd2_build,
    q_time_weighted_avg,
)
from review_engine_spark.sources.io import read_parquet_table


def _events_pdf(spark, sf_dir):
    return (
        read_parquet_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )


def test_gap_islands_matches_python_streaks(spark, sf_dir):
    got = {
        r["user_id"]: (r["n_islands"], r["longest_streak"], r["active_days"])
        for r in q_gap_islands(spark, sf_dir).collect()
    }
    pdf = _events_pdf(spark, sf_dir)
    for uid, g in pdf.groupby("user_id"):
        days = sorted({t.date() for t in g["ts"]})
        islands = []
        run = 1
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                run += 1
            else:
                islands.append(run)
                run = 1
        islands.append(run)
        assert got[uid] == (len(islands), max(islands), len(days)), uid


def test_concurrency_matches_bruteforce_sweep(spark, sf_dir):
    got = {
        (r["event_type"], r["day"]): r["max_concurrent"]
        for r in q_concurrency(spark, sf_dir).collect()
    }
    pdf = _events_pdf(spark, sf_dir)
    pdf["day"] = pdf["ts"].dt.date
    for (et, day), g in pdf.groupby(["event_type", "day"]):
        midnight = pd.Timestamp(day) + timedelta(days=1)
        deltas = []
        for t in g["ts"]:
            deltas.append((t, 1))
            deltas.append((min(t + timedelta(minutes=5), midnight), -1))
        deltas.sort(key=lambda d: (d[0], d[1]))  # ends before starts on ties
        live = peak = 0
        for _, d in deltas:
            live += d
            peak = max(peak, live)
        assert got[(et, day.isoformat())] == peak, (et, day)


def test_scd2_versions_tile_the_timeline(spark, sf_dir):
    rows = q_scd2_build(spark, sf_dir).collect()
    pdf = _events_pdf(spark, sf_dir)
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["version"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, g in pdf.groupby("user_id"):
        # Python reference: collapse consecutive duplicates.
        seq = list(g["event_type"])
        ts = list(g["ts"])
        expect = []
        for et, t in zip(seq, ts):
            if not expect or expect[-1][0] != et:
                expect.append((et, t))
        vers = by_user[uid]
        assert [v["event_type"] for v in vers] == [e[0] for e in expect]
        assert [v["valid_from"] for v in vers] == [e[1] for e in expect]
        # Versions are 1..n and valid_to chains to the next valid_from.
        assert [v["version"] for v in vers] == list(range(1, len(vers) + 1))
        for a, b in zip(vers, vers[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert vers[-1]["valid_to"] is None


def test_attribution_matches_python_last_touch(spark, sf_dir):
    got = {
        r["touch_day"]: (r["n_purchases"], r["attributed_cents"])
        for r in q_attribution(spark, sf_dir).collect()
    }
    pdf = _events_pdf(spark, sf_dir)
    credit: Counter = Counter()
    npur: Counter = Counter()
    for uid, g in pdf.groupby("user_id"):
        clicks = g[g["event_type"] == "click"]
        for _, p in g[g["event_type"] == "purchase"].iterrows():
            win = clicks[
                (clicks["ts"] <= p["ts"])
                & (clicks["ts"] > p["ts"] - timedelta(days=7))
            ]
            if len(win):
                last = win.sort_values(["ts", "event_id"]).iloc[-1]
                day = last["ts"].date().isoformat()
                credit[day] += int(math.floor(p["value"] * 100 + 0.5))
                npur[day] += 1
    assert got == {d: (npur[d], credit[d]) for d in credit}


def test_twap_matches_pandas_weighted_mean(spark, sf_dir):
    got = {
        r["user_id"]: (r["total_secs"], r["twap"])
        for r in q_time_weighted_avg(spark, sf_dir).collect()
    }
    pdf = _events_pdf(spark, sf_dir)
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        secs = g["ts"].astype("int64") // 1_000_000_000
        dur = (secs.shift(-1) - secs).dropna().astype(int)
        cents = (g["value"] * 100 + 0.5).apply(math.floor).astype(int)
        w = dur.values
        v = cents.values[: len(w)]
        if w.sum() <= 0:
            assert uid not in got
            continue
        twap = round(int((v * w).sum()) / (int(w.sum()) * 100.0), 6)
        assert got[uid] == (int(w.sum()), twap), uid


def test_path_topk_matches_python_counter(spark, sf_dir):
    got = [(r["path"], r["n_users"]) for r in q_path_topk(spark, sf_dir).collect()]
    pdf = _events_pdf(spark, sf_dir)
    paths = Counter(
        ">".join(g.sort_values(["ts", "event_id"])["event_type"].head(5))
        for _, g in pdf.groupby("user_id")
    )
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == expect or sorted(got, key=lambda kv: (-kv[1], kv[0])) == expect


def test_rolling_active_matches_python_sets(spark, sf_dir):
    got = {
        r["day"]: r["active_7d"] for r in q_rolling_active(spark, sf_dir).collect()
    }
    pdf = _events_pdf(spark, sf_dir)
    pdf["day"] = pdf["ts"].dt.date
    by_day = pdf.groupby("day")["user_id"].agg(set)
    for day, _ in by_day.items():
        users = set()
        for d, s in by_day.items():
            if 0 <= (day - d).days <= 6:
                users |= s
        assert got[day.isoformat()] == len(users), day


def test_mann_whitney_matches_pandas_ranks(spark, sf_dir):
    row = q_mann_whitney(spark, sf_dir).collect()[0]
    pdf = _events_pdf(spark, sf_dir)
    s = pdf[pdf["event_type"].isin(["click", "view"])].copy()
    s["v"] = (s["value"] * 100 + 0.5).apply(math.floor).astype(int)
    s["rank"] = s["v"].rank(method="average")
    a = s[s["event_type"] == "click"]
    b = s[s["event_type"] == "view"]
    n1, n2 = len(a), len(b)
    u = a["rank"].sum() - n1 * (n1 + 1) / 2
    assert row["n_click"] == n1 and row["n_view"] == n2
    assert row["u_stat"] == round(u, 4)
    # Tie-corrected z against the textbook formula.
    nn = n1 + n2
    ties = s.groupby("v").size()
    tie_term = float((ties**3 - ties).sum())
    sigma2 = n1 * n2 / 12.0 * ((nn + 1.0) - tie_term / (nn * (nn - 1.0)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(sigma2)
    assert abs(row["z"] - z) < 1e-6


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    row = q_ols_regression(spark, sf_dir).collect()[0]
    li = (
        read_parquet_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    x1 = np.floor(li["l_quantity"] + 0.5).astype(np.int64)
    x2 = np.floor(li["l_discount"] * 10000 + 0.5).astype(np.int64)
    y = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(np.int64)
    X = np.column_stack([np.ones(len(x1)), x1, x2]).astype(float)
    beta, *_ = np.linalg.lstsq(X, y.astype(float), rcond=None)
    assert abs(row["beta0_cents"] - beta[0]) < 1e-2
    assert abs(row["beta1_cents_per_unit"] - beta[1]) < 1e-4
    assert abs(row["beta2_cents_per_bp"] - beta[2]) < 1e-4


def test_interval_merge_matches_python_sweep(spark, sf_dir):
    got = {
        r["user_id"]: (r["n_intervals"], r["covered_us"])
        for r in q_interval_merge(spark, sf_dir).collect()
    }
    pdf = _events_pdf(spark, sf_dir)
    for uid, g in pdf.groupby("user_id"):
        spans = sorted(
            (t, t + timedelta(minutes=5)) for t in g["ts"]
        )
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        covered = sum(int((e - s).total_seconds() * 1e6) for s, e in merged)
        assert got[uid] == (len(merged), covered), uid


def test_survival_km_matches_python_kaplan_meier(spark, sf_dir):
    rows = {
        r["t_days"]: (r["deaths"], r["at_risk"], r["survival"])
        for r in q_survival_km(spark, sf_dir).collect()
    }
    pdf = _events_pdf(spark, sf_dir)
    end_ts = pdf["ts"].max()
    durs = []
    for uid, g in pdf.groupby("user_id"):
        sg = g[g["event_type"] == "signup"]
        if not len(sg):
            continue
        s_ts = sg["ts"].min()
        pu = g[(g["event_type"] == "purchase") & (g["ts"] >= s_ts)]
        if len(pu):
            durs.append(((pu["ts"].min() - s_ts).days, 1))
        else:
            durs.append((((end_ts - s_ts).days), 0))
    n = len(durs)
    surv = 1.0
    seen = 0
    for t in sorted({d for d, _ in durs}):
        at = [x for x in durs if x[0] == t]
        at_risk = n - seen
        deaths = sum(e for _, e in at)
        surv *= 1.0 - deaths / at_risk
        seen += len(at)
        d, r, s = rows[t]
        assert (d, r) == (deaths, at_risk), t
        assert abs(s - surv) < 1e-5, t


def test_robust_zscore_matches_numpy_mad(spark, sf_dir):
    rows = {r["event_type"]: r for r in q_robust_zscore(spark, sf_dir).collect()}
    pdf = _events_pdf(spark, sf_dir)
    pdf["cents"] = (pdf["value"] * 100 + 0.5).apply(math.floor).astype(int)
    for et, g in pdf.groupby("event_type"):
        med = float(np.median(g["cents"]))
        mad = float(np.median(np.abs(g["cents"] - med)))
        out = int((0.6745 * np.abs(g["cents"] - med) / mad > 3.5).sum())
        r = rows[et]
        assert r["med_cents"] == med and r["mad_cents"] == mad
        assert r["n"] == len(g) and r["n_outliers"] == out


def test_resource_allocation_matches_python_scores(spark, sf_dir):
    got = [
        (r["u1"], r["u2"], r["score_micro"], r["shared_parts"])
        for r in q_resource_allocation(spark, sf_dir).collect()
    ]
    o = read_parquet_table(spark, sf_dir, "orders").toPandas()
    li = read_parquet_table(spark, sf_dir, "lineitem").toPandas()
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    up = j[["o_custkey", "l_partkey"]].drop_duplicates()
    deg = up.groupby("l_partkey").size()
    scores: Counter = Counter()
    shared: Counter = Counter()
    for p, g in up.groupby("l_partkey"):
        d = deg[p]
        if not (2 <= d <= 50):
            continue
        users = sorted(g["o_custkey"])
        w = math.floor(1_000_000.0 / d)
        for i, a in enumerate(users):
            for b in users[i + 1:]:
                scores[(a, b)] += w
                shared[(a, b)] += 1
    expect = sorted(
        ((u1, u2, s, shared[(u1, u2)]) for (u1, u2), s in scores.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:100]
    assert got == expect


def test_winsorize_matches_numpy_clip(spark, sf_dir):
    rows = {r["event_type"]: r for r in q_winsorize(spark, sf_dir).collect()}
    pdf = _events_pdf(spark, sf_dir)
    pdf["cents"] = (pdf["value"] * 100 + 0.5).apply(math.floor).astype(int)
    for et, g in pdf.groupby("event_type"):
        lo = math.floor(np.percentile(g["cents"], 5, method="linear"))
        hi = math.floor(np.percentile(g["cents"], 95, method="linear"))
        mean = round(int(np.clip(g["cents"], lo, hi).sum()) / (len(g) * 100.0), 6)
        r = rows[et]
        assert (r["lo_cents"], r["hi_cents"], r["wins_mean"]) == (lo, hi, mean)


def test_spend_deciles_cover_all_users_and_match_numpy_bounds(spark, sf_dir):
    rows = {r["decile"]: r for r in q_spend_deciles(spark, sf_dir).collect()}
    pdf = _events_pdf(spark, sf_dir)
    p = pdf[pdf["event_type"] == "purchase"].copy()
    p["cents"] = (p["value"] * 100 + 0.5).apply(math.floor).astype(int)
    spend = p.groupby("user_id")["cents"].sum()
    qs = np.percentile(spend, [10 * i for i in range(1, 10)], method="linear")
    deciles = 1 + (spend.values[:, None] > qs[None, :]).sum(axis=1)
    for d in range(1, 11):
        mask = deciles == d
        if not mask.any():
            assert d not in rows
            continue
        r = rows[d]
        assert r["n_users"] == int(mask.sum())
        assert r["total_cents"] == int(spend.values[mask].sum())
        assert r["min_cents"] == int(spend.values[mask].min())
        assert r["max_cents"] == int(spend.values[mask].max())
    assert sum(r["n_users"] for r in rows.values()) == len(spend)
