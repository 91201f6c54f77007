"""Streaming upsert (foreachBatch MERGE) equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_upsert_equals_batch_latest(spark, sf_dir):
    """The incremental foreachBatch merge over 3 micro-batches lands
    exactly the batch latest-row-per-key result (ts desc, event_id desc
    tie-break) — upserts genuinely supersede earlier batches' rows."""
    from pyspark.sql.window import Window

    from review_engine_spark.sources.io import read_parquet_table
    from review_engine_spark.streaming.jobs import run_stream_upsert

    got = {
        (r["user_id"], r["event_type"]): (r["event_id"], r["value"])
        for r in run_stream_upsert(spark, sf_dir).collect()
    }
    ev = read_parquet_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = {
        (r["user_id"], r["event_type"]): (r["event_id"], r["value"])
        for r in ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    assert got == want


def test_stream_near_dup_cross_batch_state(spark, sf_dir):
    """The LSH bucket state must carry across micro-batches: the
    chunked run (3 doc_id-range files, maxFilesPerTrigger=1) must flag
    exactly the same per-doc band hits as the single-batch run — a dup
    pair split across chunks is caught only if batch 2 reads batch 1's
    bucket state."""
    from review_engine_spark.streaming.jobs import run_stream_near_dup

    def agg(df):
        return {
            (r["doc_id"], r["band_idx"]): r["hit"] for r in df.collect()
        }

    one_batch = agg(run_stream_near_dup(spark, sf_dir, n_chunks=1))
    chunked = agg(run_stream_near_dup(spark, sf_dir, n_chunks=3))
    assert one_batch == chunked
    assert sum(one_batch.values()) > 0  # the check must not be vacuous


def _mini_docs_dir(spark, tmp_path):
    """Six-doc corpus with ONE near-dup pair (0, 5) whose members land
    in different doc_id-range chunks at n_chunks=2 (0-2 | 3-5)."""
    dup = "the quick brown fox jumps over the lazy dog tonight"
    uniq = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet colors here now",
        "north south east west compass points guide the old sailors",
    ]
    rows = [(0, dup)] + [(i + 1, t) for i, t in enumerate(uniq)] + [(5, dup)]
    d = str(tmp_path / "mini_sf")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{d}/documents.parquet")
    return d


def test_stream_near_dup_out_of_order_min_id_is_conservative(
    spark, tmp_path
):
    """The documented min_id horizon, pinned: when the chunk holding
    doc 5 (the LATER member of the dup pair) arrives BEFORE the chunk
    holding doc 0, the min_id rule flags NOTHING — doc 5 finds empty
    buckets, doc 0 displaces it as occupant without being flagged. The
    degradation is conservative (flags ⊆ in-order flags, no spurious
    extras), never wrong-positive."""
    from review_engine_spark.streaming.jobs import run_stream_near_dup

    d = _mini_docs_dir(spark, tmp_path)

    def hits(df):
        return {
            (r["doc_id"], r["band_idx"])
            for r in df.collect()
            if r["hit"] == 1
        }

    in_order = hits(run_stream_near_dup(spark, d, n_chunks=2))
    assert in_order  # doc 5 flagged on every band in the in-order run
    assert {doc for doc, _ in in_order} == {5}
    shuffled = hits(
        run_stream_near_dup(spark, d, n_chunks=2, chunk_order=[1, 0])
    )
    assert shuffled == set()  # pair delivered in reverse: both survive
    assert shuffled <= in_order  # conservative, not spurious


def test_stream_near_dup_first_arrival_flags_late_arrivals(
    spark, tmp_path
):
    """The production-ingest variant: the first-ARRIVED doc keeps the
    bucket, so under reversed delivery doc 0 (arriving after its dup
    twin doc 5) is flagged on exactly the bands doc 5 was flagged on
    in the in-order run."""
    from review_engine_spark.streaming.jobs import run_stream_near_dup

    d = _mini_docs_dir(spark, tmp_path)

    def hits(df):
        return {
            (r["doc_id"], r["band_idx"])
            for r in df.collect()
            if r["hit"] == 1
        }

    in_order = hits(
        run_stream_near_dup(
            spark, d, n_chunks=2, occupant="first_arrival"
        )
    )
    shuffled = hits(
        run_stream_near_dup(
            spark,
            d,
            n_chunks=2,
            chunk_order=[1, 0],
            occupant="first_arrival",
        )
    )
    # same bands fire either way; only WHICH twin is flagged follows
    # the arrival order
    assert {doc for doc, _ in in_order} == {5}
    assert {doc for doc, _ in shuffled} == {0}
    assert {b for _, b in in_order} == {b for _, b in shuffled}


def test_stream_near_dup_rejects_unknown_occupant(spark, sf_dir):
    import pytest

    from review_engine_spark.streaming.jobs import run_stream_near_dup

    with pytest.raises(ValueError, match="occupant"):
        run_stream_near_dup(spark, sf_dir, occupant="latest")


def test_stream_near_dup_empty_table_chunked(spark, tmp_path):
    """An EMPTY documents table through the chunked path must return
    the empty flags frame (same schema), not TypeError on None+1 from
    the max(doc_id) range-split probe (ADVICE r8)."""
    from review_engine_spark.streaming.jobs import run_stream_near_dup

    d = str(tmp_path / "empty_sf")
    spark.createDataFrame([], "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    out = run_stream_near_dup(spark, d, n_chunks=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "band_idx",
        "hit",
    ]


def _write_event_batches(tmp_path):
    """Three single-file micro-batches with users interleaved ACROSS
    batches, so the key-coarsened layouts must genuinely restore and
    re-serialize per-user state between invocations."""
    import os
    import time

    import pandas as pd

    t0 = pd.Timestamp("2024-03-01 10:00:00")
    rows_by_batch = [[], [], []]
    eid = 0
    for u in range(7):
        for k in range(14):
            b = (u + k) % 3
            # steady ~50-cent values with one huge spike late enough
            # that the zscore ring buffer has >= min_n history
            v = 500.0 if k == 12 else 50.0 + float((u * 37 + k * 11) % 7)
            rows_by_batch[b].append(
                (
                    eid,
                    u,
                    "view",
                    t0 + pd.Timedelta(minutes=40 * k + u),
                    v,
                )
            )
            eid += 1
    base = time.time()
    for i, rows in enumerate(rows_by_batch):
        # within a batch, keep event-time order non-decreasing per user
        rows.sort(key=lambda r: (r[3], r[0]))
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        path = str(tmp_path / f"ev_{i:02d}.parquet")
        pdf.to_parquet(path, index=False)
        os.utime(path, (base + i, base + i))
    return str(tmp_path)


def test_key_batched_state_layout_matches_per_key(spark, tmp_path):
    """key_buckets (state keyed by pmod(user, B), per-user folds looped
    inside one pandas group) must emit EXACTLY the per-key layout's
    rows across multiple micro-batches — same fold order, same float
    sequence, same provisional-row cadence — for all three stateful
    runners. The layout exists purely to amortize the measured ~3 ms
    per-key state plumbing (SCALING.md round 9)."""
    from review_engine_spark.streaming import jobs

    sf_dir = _write_event_batches(tmp_path)
    kw = {"path_glob": "ev_*.parquet", "max_files_per_trigger": 1}

    def rows(df, cols):
        return sorted(
            tuple(r[c] for c in cols) for r in df.collect()
        )

    for fn, cols in [
        (jobs.run_ewma_stateful, ["user_id", "n_events", "ewma"]),
        (
            jobs.run_sessionize_stateful,
            [
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "total_v",
            ],
        ),
        (jobs.run_zscore_stateful, ["event_id", "user_id", "zscore"]),
    ]:
        per_key = rows(fn(spark, sf_dir, **kw), cols)
        batched = rows(fn(spark, sf_dir, key_buckets=3, **kw), cols)
        assert per_key == batched, fn.__name__
        assert per_key, fn.__name__  # non-vacuous


def test_stream_near_dup_coarse_state_matches_per_key(spark, sf_dir):
    """The key-coarsened bucket-state layout (default) must flag
    exactly the per-key layout's (doc, band) hits — including across
    micro-batches, where a coarse group restores and re-serializes its
    whole bucket array."""
    from review_engine_spark.streaming.jobs import run_stream_near_dup

    def agg(df):
        return {
            (r["doc_id"], r["band_idx"]): r["hit"] for r in df.collect()
        }

    per_key = agg(run_stream_near_dup(spark, sf_dir, key_buckets=None))
    coarse = agg(run_stream_near_dup(spark, sf_dir))
    chunked = agg(run_stream_near_dup(spark, sf_dir, n_chunks=3))
    assert per_key == coarse == chunked
    assert sum(per_key.values()) > 0
