"""Broadcast-build audit: no corpus-scaled table may be a broadcast build.

The two stress experiments (SCALING.md) both found the same failure
class: Catalyst statically picks a broadcast hash join because the
*estimated* size of a filtered/aggregated corpus-scaled table sits under
``autoBroadcastJoinThreshold`` — a plan that works at fixture scale and
OOMs the driver at real scale. This audit sweeps EVERY declared query's
physical plan, finds each Broadcast(Hash|NestedLoop)Join build subtree,
and reports which fixture tables feed it, so corpus-scaled broadcasts
are caught at review time instead of at 20× stress time.

A broadcast build is acceptable when its subtree is:
- a dim table scan (``region``, ``nation``) — bounded at any scale;
- a global/scalar aggregate (1-row totals, k centroids, global max);
- an explicitly bounded derived set documented at the call site
  (top-k candidates, ≤200-row probe sets, dropped-id lists where the
  dup rate is the bound) — these are whitelisted per query below.

Usage: python tools/broadcast_audit.py [sf_dir]   (exit 1 on new flags)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CORPUS_TABLES = {
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
}
DIM_TABLES = {"region", "nation"}

#: plan construction executes the job (streaming runners, stateful ops,
#: driver-side loops) — their returned DataFrame is a materialized
#: snapshot with no join plan left to audit.
SKIP_PREFIXES = ("q_stream_", "q_sessionize_state")

#: query → reason its CartesianProduct is BOUNDED (each side capped at
#: the call site, or library-internal over rank-sized factor blocks).
CARTESIAN_OK: dict[str, str] = {
    "q_near_dup_embedding": "all-pairs form capped at 100 vectors; "
    "q_near_dup_lsh is the declared scale path",
    "q_ngram_jaccard": "all-pairs over a doc_id<30 capped subset; "
    "LSH feeds candidates at scale (operators.dedup)",
    "q_minhash_jaccard": "MINHASH_CAP-doc capped estimator twin; "
    "banded LSH is the production path",
    "q_als_recommend": "MLlib recommendForAllUsers blocked factor "
    "cross — both sides are rank-wide factor matrices",
}

#: query → reason the corpus-table broadcast under it is BOUNDED (reviewed
#: by hand; the bound is in the query's own docstring).
WHITELIST: dict[str, str] = {
    "q_dau_mau_hll": "distinct calendar days — bounded by the calendar "
    "(≤ a few thousand rows at any corpus age), not the corpus",
    "q_mutual_info": "lang/source marginals + the 1-row total — bounded "
    "by the attribute DOMAINS (enumeration-like codes, ≤ dozens of "
    "rows each), not the corpus; the q_dau_mau_hll domain-bounded "
    "class",
    "q_mmr": "collected ≤200-row candidate set (reference semantics)",
    "q_dot": "1-row query vector (vec_id=0 filtered slice)",
    "q_knn_ivf": "≤2 query vectors + k centroid rows (both bounded)",
    "q_star_join": "deliberate broadcast-star demo over catalog dims; "
    "the bucketed/salted variants cover the shuffled-fact case",
    "q_negative_sample": "1-row max-item bound (anti-join side already "
    "pins shuffle_hash)",
    "q_mmr_grouped": "per-group ≤200-row candidate sets",
    "q_knn_bruteforce": "≤8 query vectors broadcast against the corpus",
    "q_knn_batch": "≤8 query vectors broadcast against the corpus",
    "q_cosine_topk": "single query vector",
    "q_hard_negatives": "3-row anchor set",
    "q_near_dup_embedding": "vec_id<100 capped slice (documented cap)",
    "q_contamination": "benchmark probe set — fixed-size by definition",
    "q_decontaminate": "benchmark probe set — fixed-size by definition",
    "q_semantic_dedup": "k=8 centroid rows",
    "q_kmeans": "k=8 centroid rows",
    "q_mixture_weights": "per-source recipe rows (|sources| ≪ corpus)",
    "q_mixture_apply": "per-source recipe rows",
    "q_mix_upsample": "per-source recipe rows",
    "q_dedup_apply": "dropped-id set, bounded by dup rate (documented)",
    "q_percentile_norm": "1-row global percentile aggregate",
    "q_dsir_weights": "feature-count tables keyed by hash BUCKET — "
    "≤4096 rows by construction at any corpus size (the whole point "
    "of DSIR's hashed features), plus the 1-row totals aggregate",
    "q_dsir_sample": "same ≤4096-row bucket tables as q_dsir_weights "
    "plus the 1-row percentile cutoff (D7)",
    "q_skew_profile": "1-row global total",
    "q_stats_agg": "1-row global moments",
    "q_train_split": "1-row split thresholds",
    "q_recsys_eval": "per-user top-k recommendation set (k·|eval users|)",
    "q_rank_blend": "1-row global normalization bounds",
    "q_price_fit": "1-row global price stats",
    "q_rate_sample": "per-stratum rate rows",
    "q_stratified_sample": "per-stratum count rows",
    "q_domain_cap": "per-source cap rows",
    "q_quality_gate": "1-row global thresholds",
    "q_length_buckets": "bucket-boundary rows (fixed bucket count)",
    "q_unigram_logprob": "vocab-total 1-row aggregate",
    "q_top_tokens": "global top-k vocabulary (fixed k)",
    # category-keyed aggregates: the key is a bounded enum (5 event
    # types / 64 bloom words / calendar days), so the build is
    # |categories| rows whatever the corpus volume
    "q_robust_zscore": "per-event-type median+MAD rows (5 categories)",
    "q_approx_percentile": "per-returnflag sketch rows (3 flag values)",
    "q_chi2_independence": "contingency margin rows (|types| x |dows|)",
    "q_bloom_membership": "64-word bloom filter rows (fixed width)",
    "q_winsorize": "per-event-type percentile cutoff rows (5 categories)",
    "q_seasonal_decompose": "per-event-type totals (5 categories)",
    "q_rolling_active": "distinct calendar days (window-bounded)",
    "q_countmin": "4x512 fixed-size sketch grid (<=2048 rows)",
    "q_dense_report": "distinct calendar months (calendar-bounded spine)",
    "q_dau_mau": "distinct calendar days (calendar-bounded)",
    "q_boilerplate": "shared-span top set, bounded by span df threshold",
    "q_funnel": "per-step first-touch aggregates keyed small",
    "q_pmi_bigrams": "1-row corpus totals",
    "q_tfidf": "1-row doc-count aggregate",
    "q_text_stats": "1-row corpus totals",
    "q_tpch_q11": "1-row importance-threshold aggregate",
    "q_cusum": "1-row CUSUM target (quantized global mean)",
    "q_markov_transitions": "per-event-type totals (bounded type domain)",
    "q_histogram": "1-row min/max bounds",
    "q_data_profile": "single-scan profile rows (|columns|-bounded)",
    "q_zorder_key": "1-row global bounds",
    "q_resample_ffill": "per-key time-grid rows (bounded grid)",
    "q_cohort_retention": "per-cohort first-touch rows",
    "q_tpch_q15": "1-row global max revenue (D7 cross-join-back)",
    "q_tpch_q22": "1-row global average balance (D7 cross-join-back)",
    "q_bm25": "|query|-row df aggregate + 1-row (N, avgdl) stats",
    "q_minhash_jaccard": "signature set capped at 32 docs (declared all-pairs cap)",
    "q_freq_items": "sketch candidate set (≤1/support rows) + 1-row total",
}


def _subtree_tables(lines: list[str], start: int) -> tuple[set[str], bool, bool]:
    """(tables scanned, any-aggregate, scalar-agg-covered) inside the
    subtree rooted at ``start`` in a toString() physical-plan tree.

    ``scalar_agg`` is true only when EVERY corpus-table scan in the
    subtree sits underneath a GLOBAL aggregate (``keys=[]``) node: such
    a branch is a bounded-row reduction (1-row totals / cutoffs /
    global max — the D7 pattern) whatever corpus volume feeds it, so the
    broadcast is safe. A corpus scan OUTSIDE every scalar-agg branch
    (e.g. a build whose root joins a 1-row global aggregate against an
    unreduced corpus scan) does NOT qualify — that build is still
    corpus-scaled and must be whitelisted or flagged. Keyed aggregates
    never qualify either — a per-entity rollup over a corpus table is
    corpus-scaled."""

    def indent(ln: str) -> int:
        """Tree depth from the structural prefix only: the leading run of
        whitespace and tree-drawing characters (' ', ':', '+', '-'). A
        '+-'/':-'-looking fragment later in the line (e.g. inside a plan
        string literal) never counts, and a line with no marker at all is
        treated as content of the current node, not as depth -1."""
        m = re.match(r"[ :+\-]*", ln)
        prefix = m.group(0)
        return len(prefix) if prefix.rstrip().endswith(("+-", ":-")) else -1

    base = indent(lines[start])
    tables: set[str] = set()
    has_agg = False
    any_scalar = False
    uncovered_corpus = False
    # Indents of scalar-aggregate nodes whose subtree the walk is
    # currently inside; a corpus scan is "covered" iff this is non-empty.
    agg_stack: list[int] = []
    for ln in lines[start + 1 :]:
        ind = indent(ln)
        if ind >= 0 and ind <= base:
            break  # structurally shallower tree line: subtree ends
        if ind >= 0:
            while agg_stack and ind <= agg_stack[-1]:
                agg_stack.pop()  # left that scalar-agg's subtree
        m = re.search(r"(\w+)\.parquet", ln)
        if m:
            tables.add(m.group(1))
            if m.group(1) in CORPUS_TABLES and not agg_stack:
                uncovered_corpus = True
        if "Aggregate" in ln:
            has_agg = True
            if re.search(r"Aggregate\w*\(keys=\[\]", ln):
                any_scalar = True
                if ind >= 0:
                    agg_stack.append(ind)
    return tables, has_agg, any_scalar and not uncovered_corpus


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from review_engine_spark.session import get_spark

    spark = get_spark("broadcast-audit")
    qs = entrymod.queries()
    flags: list[str] = []
    n_broadcasts = 0
    for name, fn in qs.items():
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            df = fn(spark, sf_dir)
            # executedPlan (not sparkPlan): BroadcastExchange nodes are
            # inserted by EnsureRequirements during plan preparation
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"skip      {name}: plan unavailable ({repr(e)[:80]})")
            continue
        # Repo-wide invariant piggybacking on the same plan walk: NO
        # declared query may plan a CartesianProduct. A bounded 1-row
        # cross join lowers to BroadcastNestedLoopJoin, so any
        # CartesianProduct that survives planning is an unkeyed join of
        # two shuffled sides — quadratic at scale, never intended here.
        if "CartesianProduct" in plan:
            if name in CARTESIAN_OK:
                print(f"ok(wl)    {name}: CartesianProduct — {CARTESIAN_OK[name]}")
            else:
                flags.append(name)
                print(f"FLAG      {name}: CartesianProduct in final plan")
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            n_broadcasts += 1
            tables, has_agg, scalar_agg = _subtree_tables(lines, i)
            corpus = tables & CORPUS_TABLES
            if not corpus:
                continue  # dim-only build: always fine
            if scalar_agg:
                # every corpus scan in the build sits under a global
                # (keys=[]) aggregate: bounded-row reduction (D7)
                continue
            if name in WHITELIST:
                print(f"ok(wl)    {name}: broadcast over {sorted(corpus)} — "
                      f"{WHITELIST[name]}")
                continue
            detail = "aggregated" if has_agg else "RAW SCAN"
            flags.append(name)
            print(f"FLAG      {name}: broadcast build reads corpus table(s) "
                  f"{sorted(corpus)} ({detail}) — bound it or pin merge/shuffle_hash")
    print(f"\n{n_broadcasts} broadcast builds audited; {len(flags)} flagged")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
