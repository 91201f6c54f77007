"""Streaming jobs over the events surface (SURVEY §2.I).

The reference has no streaming operators — its only incremental construct
is a stateless Q&A REPL (semantic.py:76-106). The engine declares the
minimal Structured Streaming surface the north star asks for: watermarked
tumbling-window aggregation (validated in batch mode against the same SQL,
q_stream_tumbling) and gap-based sessionization via session_window.

Scale notes: state store size is bounded by the watermark horizon; the
shuffle is keyed on (window, event_type) — same layout as the batch
aggregate, so a batch backfill and the live stream produce identical
partitioning.
"""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "tumbling_counts",
    "run_tumbling_count_batchlike",
    "sessionize",
    "run_sessionize_stateful",
    "run_stream_dedup",
    "run_stream_stream_join",
    "run_stream_to_parquet",
    "run_stream_upsert",
    "run_stream_near_dup",
]

from contextlib import contextmanager


def _resolve_key_buckets(kb, state_partitions: int = 8) -> int | None:
    """Resolve the ``key_buckets`` knob shared by the stateful runners.

    ``"auto"`` (the default) sizes the bucket count to 16× the resolved
    state-partition count — enough buckets that every state partition
    folds ~16 groups (smooths skew), few enough that the per-invocation
    plumbing constant is amortized across many users. ``None`` selects
    the per-key layout (one GroupState entry per user — the canonical
    form the r8 profiling chunk measured at ~3 ms/key/batch);
    an int pins the bucket count exactly.
    """
    if kb is None:
        return None
    if isinstance(kb, int) and not isinstance(kb, bool):
        # kb < 1 would reach F.pmod(user_id, kb) and yield NULL,
        # silently collapsing all state into one NULL-keyed bucket
        if kb < 1:
            raise ValueError(f"key_buckets must be >= 1, got {kb}")
        return kb
    if kb != "auto":
        raise ValueError(f"key_buckets must be None, int, or 'auto': {kb!r}")
    import os

    n = int(os.environ.get("SPARK_GRAFT_STATE_PARTITIONS", state_partitions))
    return 16 * n


@contextmanager
def _state_partitions(spark: SparkSession, n: int):
    """Scope the shuffle-partition count around a streaming run.

    Stateful operators create one state-store instance per shuffle
    partition, and the partition count is frozen into the checkpoint at
    first start — so it must be SIZED, not defaulted: enough partitions
    to spread peak state across executors, no more (each adds store
    init, snapshot, and commit overhead per micro-batch; measured 4x on
    the finite fixture runs: 32 -> 8 partitions cut the stream-stream
    join from 9.8 s to 2.5 s). These finite-source runners default to a
    small fixed count; a production job sizes it to peak keyed-state
    volume — ``SPARK_GRAFT_STATE_PARTITIONS`` overrides for exactly
    that reason (the 100× stress runs need the fold parallelism the
    fixture-sized default caps at 8; see SCALING.md round-8 chunk).
    """
    import os

    n = int(os.environ.get("SPARK_GRAFT_STATE_PARTITIONS", n))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)



def _snapshot(
    spark: SparkSession,
    stream_df: DataFrame,
    mode: str,
    name: str,
    state_partitions: int = 8,
) -> DataFrame:
    """Drive a finite streaming DataFrame to completion and return the
    result snapshot as a batch DataFrame.

    Sink selection (``SPARK_GRAFT_STREAM_SINK``):

    - ``memory`` (default) — the memory sink + an Arrow ``toPandas``
      snapshot. Driver-bound by design: correct and fast for the
      sf0.01/sf0.1 oracle contract, where every runner's full output is
      a few thousand rows, but it would funnel a large source through
      the driver.
    - ``files`` — the production-shaped path, used by the 100× stress
      chunk (SCALING.md) so the measurement never bottlenecks on a
      driver collect. ``append``-mode queries land in a parquet
      ``FileStreamSink`` (exactly-once via its ``_spark_metadata``
      transaction log); ``update``/``complete`` queries run through
      ``foreachBatch`` parquet writes. ``foreachBatch`` is only
      at-least-once, so each landing is made IDEMPOTENT by batch id:
      update mode overwrites ``out_dir/batch-<id>`` (a retried batch
      replaces its own subdirectory instead of double-appending — the
      union of subdirs is then exactly the row multiset the memory sink
      accumulates), complete mode overwrites the whole directory (last
      write is the final snapshot). The return value is the directory
      read back through the DISTRIBUTED batch reader — no row ever
      crosses the driver; the temp directory is registered for cleanup
      at interpreter exit (the lazy DataFrame must outlive this call).
      A runner whose stream emits zero rows returns an empty DataFrame
      with the stream's schema (the foreachBatch modes write no files
      to infer from). Parity between both paths is pinned per output
      mode in tests/test_streaming_sinks.py.
    """
    import atexit
    import os
    import shutil

    use_files = (
        os.environ.get("SPARK_GRAFT_STREAM_SINK", "memory") == "files"
    )
    with _state_partitions(spark, state_partitions), tempfile.TemporaryDirectory() as ckpt:
        if not use_files:
            q = (
                stream_df.writeStream.outputMode(mode)
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)
            out = spark.table(name)
            # snapshot through Arrow before the memory table goes away
            # (collect->python rows is 10x slower at 100k rows)
            return spark.createDataFrame(out.toPandas(), out.schema)
        out_dir = tempfile.mkdtemp(prefix=f"{name}_sink_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        if mode == "append":
            q = (
                stream_df.writeStream.outputMode("append")
                .format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .start()
            )
        elif mode == "complete":

            def land(batch_df: DataFrame, batch_id: int) -> None:
                batch_df.write.mode("overwrite").parquet(out_dir)

            q = (
                stream_df.writeStream.outputMode(mode)
                .foreachBatch(land)
                .option("checkpointLocation", ckpt)
                .start()
            )
        else:
            # update mode: one subdirectory per batch id ("batch-<id>",
            # deliberately NOT key=value so partition discovery never
            # injects a batch column into the schema); overwrite makes a
            # retried batch replace rather than double-append.
            def land(batch_df: DataFrame, batch_id: int) -> None:
                batch_df.write.mode("overwrite").parquet(
                    f"{out_dir}/batch-{batch_id}"
                )

            q = (
                stream_df.writeStream.outputMode(mode)
                .foreachBatch(land)
                .option("checkpointLocation", ckpt)
                .start()
            )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
        has_files = any(
            f.endswith(".parquet")
            for root, _dirs, files in os.walk(out_dir)
            if "_spark_metadata" not in root
            for f in files
        )
        if not has_files:
            return spark.createDataFrame([], stream_df.schema)
        if mode == "update":
            # pass the batch dirs explicitly: a glob path works but makes
            # FileStreamSink.hasMetadata stat the literal glob string and
            # log a FileNotFoundException fallback on every read
            batch_dirs = sorted(
                os.path.join(out_dir, d)
                for d in os.listdir(out_dir)
                if d.startswith("batch-")
            )
            return spark.read.parquet(*batch_dirs)
        return spark.read.parquet(out_dir)


def _events_stream(
    spark: SparkSession,
    sf_dir: str,
    path_glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Finite-source streaming reader for an events feed, with ``ts``
    normalized to TIMESTAMP whatever the files store.

    Structured Streaming requires an explicit schema, but the fixture's
    on-disk type has changed across driver rounds — TIMESTAMP(NANOS)
    (arriving as ns-longs under nanosAsLong), raw int64 ns (test
    fixtures), and TIMESTAMP(MICROS, isAdjustedToUTC=false) → NTZ. A
    cheap batch footer peek of the matching files decides which schema
    the stream declares and which fixup applies, mirroring
    sources.io.read_parquet_table.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the fixture stores a table as a single FILE (<dir>/events.parquet),
    # Spark-written corpora (stress replicas, sinks) as a DIRECTORY of
    # part files — pathGlobFilter matches file BASENAMES, so point the
    # reader at the directory layout directly when that's what exists
    import os

    table_dir = os.path.join(sf_dir, path_glob)
    if os.path.isdir(table_dir):
        src_path, glob_opt = table_dir, None
    else:
        src_path, glob_opt = sf_dir, path_glob

    def _opt(r):
        return r.option("pathGlobFilter", glob_opt) if glob_opt else r

    batch = _opt(spark.read).parquet(src_path)
    ts_type = dict(batch.dtypes).get("ts")
    reader = _opt(spark.readStream.schema(batch.schema).format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(src_path)
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts(events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window count/sum per event_type. Works on both
    batch and streaming DataFrames (withWatermark is a no-op in batch)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_v"))
        .select(
            F.col("win.start").alias("ws"),
            F.col("win.end").alias("we"),
            "event_type",
            "n",
            "total_v",
        )
    )


def run_tumbling_count_batchlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the streaming tumbling aggregate to completion over the
    events parquet (availableNow semantics: finite source, memory sink) —
    the batch-validated form behind q_stream_tumbling."""
    # readStream needs a directory: point at sf_dir with a glob filter
    stream = _events_stream(spark, sf_dir)
    agg = tumbling_counts(stream)
    return _snapshot(spark, agg, "complete", "stream_tumbling_out")


def run_sessionize_stateful(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    path_glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    key_buckets: int | None | str = "auto",
) -> DataFrame:
    """Custom stateful streaming operator (SURVEY §2.I stretch goal):
    gap-based sessionization via ``applyInPandasWithState``, driven to
    completion over the finite events source.

    Semantics match ``session_window`` exactly: a session is a maximal
    run of same-user events with inter-event gaps < ``gap_minutes``;
    ``session_end`` = last event + gap (asserted equal to the
    session_window result in tests). The open session genuinely lives in
    ``GroupState`` across micro-batches: each batch seeds from
    ``state.get``, closes sessions the new events terminate, and writes
    the still-open tail back via ``state.update``. Update-mode contract:
    the open session is emitted *provisionally* each batch it changes,
    keyed by (user_id, session_start) — a later batch that extends it
    re-emits a superseding row under the same key, so downstream takes
    the latest row per key (exactly how the cross-batch pytest reads the
    memory sink). The point of the operator: custom sequential session
    logic that neither window() nor session_window() could express
    (e.g. value-dependent gap rules) runs JVM-adjacent over Arrow
    batches with real cross-batch state.

    Assumes per-user event-time arrives non-decreasing across batches
    (file/backfill order); a row older than the open session's start is
    folded by sort within its batch but cannot reopen an already-closed
    session — the same horizon any watermarked sessionizer has.

    Scale: the only shuffle keys events by user_id; state per key is one
    open session struct, bounded by the watermark horizon.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = pd.Timedelta(minutes=gap_minutes)

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_v double"
    )
    state_schema = "open_start long, open_end long, n long, v double"

    def fold_user(ts_vals, v_vals, seed):
        """One user's fold: identical statement sequence in both state
        layouts (the ONLY difference between them is state keying)."""
        sessions = []
        cur = None
        if seed is not None:  # seed the open session from the previous batch
            s0, s1, n, v = seed
            cur = [pd.Timestamp(s0, unit="us"), pd.Timestamp(s1, unit="us"), n, v]
        for ts, v in zip(ts_vals, v_vals):
            # new session when the gap is reached (session_window's
            # half-open [start, last+gap) boundary: an event at exactly
            # last+gap starts a new session)
            if cur is not None and ts - cur[1] >= gap:
                sessions.append(cur)
                cur = None
            if cur is None:
                cur = [ts, ts, 0, 0.0]
            # max(): a LATE row older than the open session's end folds in
            # without regressing the end (else session_end < session_start
            # could be emitted); late/merge semantics pinned in
            # tests/test_streaming_late.py
            cur[1] = max(cur[1], ts)
            cur[2] += 1
            cur[3] += float(v)
        return sessions, cur

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # live-stream path: flush the open session
            s0, s1, n, v = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(s0, unit="us")],
                    "session_end": [pd.Timestamp(s1, unit="us") + gap],
                    "n_events": [n],
                    "total_v": [round(v, 4)],
                }
            )
            return
        # tie-break duplicate timestamps on event_id so both state
        # layouts fold values in the same TOTAL order (ADVICE r9: a
        # ts-only unstable sort could diverge from the bucketed twin's
        # lexsort on duplicate (user, ts), flipping total_v float order)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        seed = state.get if state.exists else None
        sessions, cur = fold_user(rows["ts"], rows["value"], seed)
        if cur is not None:
            # keep the open tail in state; emit it provisionally below
            state.update((cur[0].value // 1000, cur[1].value // 1000, cur[2], cur[3]))
            sessions.append(cur)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(sessions),
                "session_start": [s[0] for s in sessions],
                "session_end": [s[1] + gap for s in sessions],
                "n_events": [s[2] for s in sessions],
                "total_v": [round(s[3], 4) for s in sessions],
            }
        )

    def fn_b(key, pdfs, state: GroupState):
        # key-coarsened layout (see run_ewma_stateful): per-bucket state
        # holds the bucket's open sessions as parallel arrays
        rows = pd.concat(list(pdfs)).sort_values(["user_id", "ts", "event_id"])
        if state.exists:
            users, s0s, s1s, ns, vs = state.get
            st = {
                int(u): (int(a), int(b), int(n), v)
                for u, a, b, n, v in zip(users, s0s, s1s, ns, vs)
            }
        else:
            st = {}
        out = {
            "user_id": [],
            "session_start": [],
            "session_end": [],
            "n_events": [],
            "total_v": [],
        }
        for uid, grp in rows.groupby("user_id", sort=True):
            uid = int(uid)
            sessions, cur = fold_user(
                grp["ts"], grp["value"], st.pop(uid, None)
            )
            if cur is not None:
                st[uid] = (
                    cur[0].value // 1000,
                    cur[1].value // 1000,
                    cur[2],
                    cur[3],
                )
                sessions.append(cur)
            out["user_id"].extend([uid] * len(sessions))
            out["session_start"].extend(s[0] for s in sessions)
            out["session_end"].extend(s[1] + gap for s in sessions)
            out["n_events"].extend(s[2] for s in sessions)
            out["total_v"].extend(round(s[3], 4) for s in sessions)
        keys = sorted(st)
        state.update(
            (
                keys,
                [st[u][0] for u in keys],
                [st[u][1] for u in keys],
                [st[u][2] for u in keys],
                [st[u][3] for u in keys],
            )
        )
        yield pd.DataFrame(out)

    stream = _events_stream(
        spark, sf_dir, path_glob=path_glob, max_files_per_trigger=max_files_per_trigger
    ).select("user_id", "ts", "value", "event_id")
    key_buckets = _resolve_key_buckets(key_buckets)
    if key_buckets is None:
        sessions = stream.groupBy("user_id").applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    else:
        bstate = (
            "users array<long>, s0s array<long>, s1s array<long>, "
            "ns array<long>, vs array<double>"
        )
        sessions = (
            stream.withColumn(
                "bucket", F.pmod("user_id", F.lit(key_buckets)).cast("int")
            )
            .groupBy("bucket")
            .applyInPandasWithState(
                fn_b, out_schema, bstate, "update", GroupStateTimeout.NoTimeout
            )
        )
    return _snapshot(spark, sessions, "update", "sessionize_stateful_out")


def sessionize(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessionization via session_window (stretch surface,
    SURVEY §2.I): per-user sessions with event counts."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_v"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_v",
        )
    )


def run_stream_dedup(
    spark: SparkSession,
    sf_dir: str,
    path_glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming exact dedup via ``dropDuplicatesWithinWatermark`` —
    the ingest-time dedup of a training-data pipeline: keep the first
    arrival per (user_id, event_type) key; the watermark bounds how long
    each key's fingerprint is held in the state store (unbounded
    dropDuplicates state is the classic streaming OOM at 100 TB/day).

    Driven to completion over the finite events source; output row count
    equals the distinct key count, which is what the rows-only check
    pins. A key re-arriving AFTER the watermark evicted its fingerprint
    is re-emitted — the bounded-state trade-off, pinned with a late-data
    fixture in tests/test_streaming_late.py.
    """
    stream = _events_stream(
        spark, sf_dir, path_glob=path_glob, max_files_per_trigger=max_files_per_trigger
    )
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _snapshot(spark, deduped, "append", "stream_dedup_out")


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase joined to the
    same user's clicks in the preceding hour (attribution). Both sides
    carry watermarks so the join state store is bounded: a click can be
    evicted once the watermark passes its one-hour attribution window —
    the state-size discipline that makes stream-stream joins viable at
    100 TB/day (unbounded join state is the failure mode).

    Driven to completion over the finite events source (append mode,
    memory sink).
    """
    def _src():
        return _events_stream(spark, sf_dir)

    clicks = (
        _src()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        _src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            """
            p_user = c_user AND
            click_ts < purchase_ts AND
            click_ts >= purchase_ts - INTERVAL 1 HOUR
            """
        ),
    ).select("purchase_id", "click_id", "p_user", "purchase_ts", "click_ts")
    return _snapshot(spark, joined, "append", "stream_stream_join_out")


def run_stream_to_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ETL to a parquet file sink — the production landing path
    (exactly-once via the sink's _spark_metadata transaction log, unlike
    the test-only memory sink): watermarked ingest dedup streamed into a
    partitioned parquet directory, then read back through the batch
    reader. Stateless-append output (dropDuplicatesWithinWatermark emits
    on first arrival), so a finite source lands every row — no
    tail-window finalization hazard.

    Scale: the sink writes one file per partition per micro-batch;
    production sizes micro-batches (maxFilesPerTrigger / trigger
    interval) so files land at ~128 MB, and compaction is a downstream
    batch job over the same directory.
    """
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    out_dir = tempfile.mkdtemp(prefix="stream_sink_")
    with _state_partitions(spark, 8), tempfile.TemporaryDirectory() as ckpt:
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
    out = spark.read.parquet(out_dir)
    # materialize the snapshot through Arrow, then delete the temp dir
    # (the returned DataFrame no longer references the files)
    snap = spark.createDataFrame(out.toPandas(), out.schema)
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    return snap


def run_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE/upsert via ``foreachBatch`` — the streaming-CDC
    landing pattern: each micro-batch's latest row per (user_id,
    event_type) is merged into a keyed target, superseding older
    versions. Plain parquet has no transactional in-place merge, so the
    merge is copy-on-write: every batch writes a NEW versioned snapshot
    and flips a pointer — the same shape a Delta/Iceberg MERGE
    executes, made explicit. The merge condition is VERSION-aware
    (``WHEN MATCHED AND s.ts > t.ts``): micro-batch arrival order is
    not event order, so an older event in a later batch must lose to
    the newer row already landed. The events fixture is split into 3
    files and streamed with ``maxFilesPerTrigger=1``, so the merge
    genuinely runs incrementally across micro-batches.

    Scale: per batch the target read is pruned to the merge keys'
    partitions in a real table format; the within-batch winner pick is
    one keyed aggregate; ties break (ts, event_id)-deterministic, so
    the final table equals the batch `q_upsert_latest` semantics over
    the full feed — pinned in tests.
    """
    from review_engine_spark.sources.io import read_parquet_table

    ev = read_parquet_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src_dir = tempfile.mkdtemp(prefix="upsert_src_")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src_dir}/chunk={i}")

    target_dir = tempfile.mkdtemp(prefix="upsert_target_")
    state = {"version": -1}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        winners = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if state["version"] >= 0:
            # Conditional MERGE (WHEN MATCHED AND s.ts > t.ts THEN
            # UPDATE): arrival order is NOT version order — a later
            # micro-batch can carry an older event, which must not
            # clobber the newer row already in the target. Re-resolve
            # the winner per key across target ∪ batch.
            cur = spark.read.parquet(f"{target_dir}/v={state['version']}")
            merged = (
                cur.unionByName(winners)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            merged = winners
        state["version"] += 1
        merged.write.mode("overwrite").parquet(
            f"{target_dir}/v={state['version']}"
        )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/chunk=*")
    )
    with _state_partitions(spark, 8), tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    out = spark.read.parquet(f"{target_dir}/v={state['version']}")
    snap = spark.createDataFrame(out.toPandas(), out.schema)
    import shutil

    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(target_dir, ignore_errors=True)
    return snap


def run_ewma_stateful(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.1,
    path_glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    key_buckets: int | None | str = "auto",
) -> DataFrame:
    """Streaming EWMA via ``applyInPandasWithState`` — the unbounded-
    history path the batch fold (plans/roster_analytics.q_ewma) documents:
    per-user state is ONE (ewma, n) pair regardless of history length, so
    a stream that never ends stays O(1) per key where collect_list would
    grow without bound.

    Exactness: the Python fold ``alpha*x + (1-alpha)*acc`` performs the
    identical IEEE-double op sequence as the batch ``F.aggregate`` lambda
    and the DuckDB ``list_reduce`` oracle, so all three agree
    bit-for-bit (pinned in tests/test_analytics.py). Update-mode emits a
    provisional (user_id, n_events, ewma) row per batch; the row with the
    largest n_events per user is final. Same in-order-arrival horizon as
    run_sessionize_stateful.

    ``key_buckets``: the KEY-COARSENED layout (round-9 floor attack).
    The r8 profiling chunk proved the family's cost is ~3 ms per KEY of
    state-store round-trip + Arrow group marshalling, not the per-event
    fold — so with N keys the plumbing bill is N·3 ms per micro-batch
    regardless of data. Setting ``key_buckets=B`` re-keys the state by
    ``pmod(user_id, B)`` and stores the bucket's users as parallel
    arrays (user_ids, accs, ns); the fold loops its users inside ONE
    pandas group, amortizing the per-invocation constant across
    ~N/B users. Per-user fold order, float sequence, and emitted rows
    are IDENTICAL to the per-key layout (parity pinned in
    tests/test_streaming.py); only the state keying changes. Tradeoff:
    per-bucket state round-trips grow with N/B (arrays serialized per
    batch), and a bucket is the unit of fold parallelism — size B ≥
    cores, ≪ N. Measured verdicts: bulk ingest in SCALING.md round 9;
    the trickle regime in round 10 (tools/profile_trickle.py): coarse
    wins 1.4-2× at touched-key fractions ≥10% and +8% at 1%; the
    crossover sits near f≈0.1%, where per-key wins by only 4% while
    ~95% of BOTH layouts' cost is the per-micro-batch fixed overhead —
    so "auto" stays coarse in all regimes by measurement, not
    bulk-ingest assumption (threshold rule: only switch to
    ``key_buckets=None`` if profiling shows touched fraction ≲0.1%
    AND the per-batch fixed cost has been engineered away).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, ewma double"
    stream = _events_stream(
        spark, sf_dir, path_glob=path_glob, max_files_per_trigger=max_files_per_trigger
    ).select("user_id", "ts", "event_id", "value")

    key_buckets = _resolve_key_buckets(key_buckets)
    if key_buckets is None:
        state_schema = "acc double, n long"

        def fn(key, pdfs, state: GroupState):
            if state.hasTimedOut:
                acc, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "ewma": [acc]}
                )
                return
            rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
            if state.exists:
                acc, n = state.get
            else:
                acc, n = None, 0
            for v in rows["value"]:
                x = float(v)
                acc = x if acc is None else alpha * x + (1.0 - alpha) * acc
                n += 1
            state.update((acc, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "ewma": [acc]}
            )

        ewma = stream.groupBy("user_id").applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
        return _snapshot(spark, ewma, "update", "ewma_stateful_out")

    state_schema = "users array<long>, accs array<double>, ns array<long>"

    def fn_b(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(
            ["user_id", "ts", "event_id"]
        )
        if state.exists:
            users, accs, ns = state.get
            st = {
                int(u): (a, int(n)) for u, a, n in zip(users, accs, ns)
            }
        else:
            st = {}
        out_u: list[int] = []
        out_n: list[int] = []
        out_e: list[float] = []
        for uid, grp in rows.groupby("user_id", sort=True):
            uid = int(uid)
            acc, n = st.get(uid, (None, 0))
            for v in grp["value"]:  # ts-sorted within user by the sort
                x = float(v)
                acc = x if acc is None else alpha * x + (1.0 - alpha) * acc
                n += 1
            st[uid] = (acc, n)
            out_u.append(uid)
            out_n.append(n)
            out_e.append(acc)
        keys = sorted(st)
        state.update(
            (
                keys,
                [st[u][0] for u in keys],
                [st[u][1] for u in keys],
            )
        )
        yield pd.DataFrame(
            {"user_id": out_u, "n_events": out_n, "ewma": out_e}
        )

    bucketed = stream.withColumn(
        "bucket", F.pmod("user_id", F.lit(key_buckets)).cast("int")
    )
    ewma = bucketed.groupBy("bucket").applyInPandasWithState(
        fn_b, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    return _snapshot(spark, ewma, "update", "ewma_stateful_out")


def run_zscore_stateful(
    spark: SparkSession,
    sf_dir: str,
    window: int = 20,
    min_n: int = 10,
    threshold: float = 2.5,
    path_glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    key_buckets: int | None | str = "auto",
) -> DataFrame:
    """Streaming rolling z-score anomalies via ``applyInPandasWithState``
    — the streaming twin of plans/roster_analytics.q_anomaly_zscore with
    a BOUNDED ring buffer as state: the last ``window`` integer-cent
    values per user (≤ 20 longs/key however long the stream runs).

    Exactness: the buffer holds exact ints, the Python moment formula
    (mean = s1/n, var = (s2 - s1*mean)/(n-1), z = (c-mean)/sqrt(var))
    performs the identical IEEE-double op sequence as the batch window
    query, so the emitted anomalies match the batch result EXACTLY on
    in-order arrival (pinned in tests/test_analytics.py). Each event is
    scored against the ``window`` PRECEDING events only — no target
    leakage — exactly like the batch ROWS BETWEEN 20 PRECEDING AND
    1 PRECEDING frame.
    """
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "event_id long, user_id long, zscore double"
    state_schema = "buf array<bigint>"

    def fold_user(eids, vals, buf, out_ids, out_z):
        """One user's ring-buffer fold — shared verbatim by both state
        layouts; returns the trimmed buffer."""
        for eid, v in zip(eids, vals):
            c = math.floor(float(v) * 100 + 0.5)
            n = len(buf)
            if n >= min_n:
                s1 = sum(buf)
                s2 = sum(b * b for b in buf)
                mean = float(s1) / float(n)
                var = (float(s2) - float(s1) * mean) / float(n - 1)
                if var > 0.0:
                    z = (float(c) - mean) / math.sqrt(var)
                    if abs(z) > threshold:
                        out_ids.append(int(eid))
                        out_z.append(round(z, 3))
            buf.append(c)
            if len(buf) > window:
                buf = buf[-window:]
        return buf

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"event_id": [], "user_id": [], "zscore": []})
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        buf = list(state.get[0]) if state.exists else []
        out_ids, out_z = [], []
        buf = fold_user(rows["event_id"], rows["value"], buf, out_ids, out_z)
        state.update((buf,))
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": [key[0]] * len(out_ids),
                "zscore": out_z,
            }
        )

    def fn_b(key, pdfs, state: GroupState):
        # key-coarsened layout (see run_ewma_stateful): flattened ring
        # buffers — (users, offsets, cents) — since the state row must
        # stay a flat Arrow struct; user u's buffer is
        # cents[offsets[i] : offsets[i+1]] for users[i] == u
        rows = pd.concat(list(pdfs)).sort_values(
            ["user_id", "ts", "event_id"]
        )
        if state.exists:
            users, offs, cents = state.get
            st = {
                int(u): list(cents[offs[i] : offs[i + 1]])
                for i, u in enumerate(users)
            }
        else:
            st = {}
        out_ids: list[int] = []
        out_us: list[int] = []
        out_z: list[float] = []
        for uid, grp in rows.groupby("user_id", sort=True):
            uid = int(uid)
            ids: list[int] = []
            zs: list[float] = []
            st[uid] = fold_user(
                grp["event_id"], grp["value"], st.get(uid, []), ids, zs
            )
            out_ids.extend(ids)
            out_us.extend([uid] * len(ids))
            out_z.extend(zs)
        keys = sorted(st)
        offsets = [0]
        flat: list[int] = []
        for u in keys:
            flat.extend(st[u])
            offsets.append(len(flat))
        state.update((keys, offsets, flat))
        yield pd.DataFrame(
            {"event_id": out_ids, "user_id": out_us, "zscore": out_z}
        )

    stream = _events_stream(
        spark, sf_dir, path_glob=path_glob, max_files_per_trigger=max_files_per_trigger
    ).select("user_id", "ts", "event_id", "value")
    key_buckets = _resolve_key_buckets(key_buckets)
    if key_buckets is None:
        anomalies = stream.groupBy("user_id").applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    else:
        bstate = (
            "users array<long>, offsets array<long>, cents array<long>"
        )
        anomalies = (
            stream.withColumn(
                "bucket", F.pmod("user_id", F.lit(key_buckets)).cast("int")
            )
            .groupBy("bucket")
            .applyInPandasWithState(
                fn_b, out_schema, bstate, "append", GroupStateTimeout.NoTimeout
            )
        )
    return _snapshot(spark, anomalies, "append", "zscore_stateful_out")


def run_stream_near_dup(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 1,
    n_seeds: int = 8,
    band_width: int = 2,
    chunk_order: list[int] | None = None,
    occupant: str = "min_id",
    key_buckets: int | None | str = "auto",
) -> DataFrame:
    """Streaming ingest-time NEAR-duplicate detection — MinHash-LSH
    banding under real cross-batch ``GroupState`` (SURVEY §2.I × the
    dedup family): the 100 TB/day training-pipeline shape, where a new
    document must be flagged against everything already ingested
    without ever joining the corpus to itself.

    Pipeline, all inside the stream: tokenize → word 3-shingles →
    ``n_seeds`` md5 min-hash signatures (the exact md5 algebra of
    ``q_minhash_jaccard``, bit-identical in DuckDB) → ``n_seeds /
    band_width`` band hashes → explode to (band_idx, band_hash, doc_id)
    → ``applyInPandasWithState`` keyed by (band_idx, band_hash). State
    per bucket is ONE long (the smallest doc_id ever seen), however
    long the stream runs; an arriving doc is flagged on a band iff an
    earlier doc already occupies its bucket. Docs with <3 tokens have
    no shingles and are dropped, mirroring the batch twin.

    With ``n_chunks > 1`` the documents fixture is split into
    doc_id-RANGE files and streamed with ``maxFilesPerTrigger=1``, so
    bucket state genuinely carries across micro-batches (a dup pair
    split across chunks is caught by batch 2 reading batch 1's state —
    pinned in tests/test_streaming.py). The default streams the fixture
    directly (single micro-batch — the same finite-source convention as
    run_sessionize_stateful, whose cross-batch proof also lives in the
    pytest, keeping the oracle-gate/bench cost at the fixed-overhead
    floor).

    **Arrival-order horizon** (``occupant``): the oracle-checked
    default ``occupant="min_id"`` flags a doc iff a SMALLER doc_id
    already occupies the bucket, which equals "duplicate of an
    earlier-ingested doc" only while ingestion order tracks doc_id —
    true for the fixture replay and for append-only ingest with
    monotone ids, the shape the batch oracle mirrors. Under
    OUT-OF-ORDER arrival it degrades conservatively: a smaller id
    arriving late is never flagged (it becomes the bucket occupant
    instead), so a dup pair delivered in reverse order survives
    entirely — flags are a subset of the in-order flags, never
    spurious extras. ``occupant="first_arrival"`` is the
    production-ingest variant: the FIRST-ARRIVED doc keeps the bucket
    forever and every later arrival is flagged regardless of id —
    order-sensitive output, but "keep what you already ingested" is
    the semantics a 100 TB/day front door actually wants (you cannot
    un-ingest the earlier copy). Within one micro-batch both fold in
    doc_id order (cross-executor row order is nondeterministic, so
    arrival rank inside a batch is defined as doc_id rank). Both
    semantics are pinned under shuffled chunk delivery
    (``chunk_order``, test-only: reorders the range-files' mtimes so
    the file source delivers them in the given sequence) in
    tests/test_streaming.py.

    Scale: the only shuffle keys band rows by (band_idx, band_hash) —
    bucket count grows with the corpus, so no bucket ever concentrates;
    state is one long per occupied bucket; per-doc work is O(bands).
    No corpus self-join exists anywhere in the plan. ``key_buckets``
    ("auto" default) applies the round-9 key-coarsened state layout:
    occupied buckets are corpus-scaled (2M at the 100× replica), so
    per-KEY GroupState pays the ~3 ms/key plumbing constant per bucket
    per batch — coarse groups of ~buckets/B fold in one invocation and
    drop the run to the signature-compute floor (measured 150 s →
    ~floor at 100×, SCALING.md round 9). ``key_buckets=None`` restores
    the per-key layout (identical flags — parity in tests); see the
    in-code comment for the trickle-stream tradeoff.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from review_engine_spark.sources.io import read_parquet_table

    if occupant not in ("min_id", "first_arrival"):
        raise ValueError(
            "occupant must be 'min_id' or 'first_arrival', got "
            f"{occupant!r}"
        )
    n_bands = n_seeds // band_width
    src_dir = None
    if n_chunks > 1:
        docs = read_parquet_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        hi = docs.agg(F.max("doc_id")).collect()[0][0]
        if hi is None:
            # empty documents table: max() is NULL and there is nothing
            # to range-split — the output schema is fixed, so return the
            # empty flags frame directly (matches the other runners'
            # empty-stream handling).
            return spark.createDataFrame(
                [], "doc_id long, band_idx int, hit int"
            )
        hi += 1
        src_dir = tempfile.mkdtemp(prefix="neardup_src_")
        step = (hi + n_chunks - 1) // n_chunks
        for i in range(n_chunks):
            docs.filter(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < (i + 1) * step)
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{src_dir}/chunk={i}"
            )
        if chunk_order is not None:
            # deliver chunks in the GIVEN sequence: the file source
            # picks up new files oldest-mtime-first, so stamping each
            # range-file with an mtime proportional to its rank in
            # chunk_order makes arrival order diverge from doc_id
            # order — the out-of-order-ingest test harness.
            import glob as _glob
            import os as _os
            import time as _time

            assert sorted(chunk_order) == list(range(n_chunks))
            base = _time.time()
            for rank, ci in enumerate(chunk_order):
                for f in _glob.glob(f"{src_dir}/chunk={ci}/*"):
                    _os.utime(f, (base + 10 * rank, base + 10 * rank))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src_dir}/chunk=*")
        )
    else:
        import os

        table_dir = os.path.join(sf_dir, "documents.parquet")
        if os.path.isdir(table_dir):
            src_path, glob_opt = table_dir, None
        else:
            src_path, glob_opt = sf_dir, "documents.parquet"
        schema = "doc_id long, text string"
        reader = spark.readStream.schema(schema).format("parquet")
        if glob_opt:
            reader = reader.option("pathGlobFilter", glob_opt)
        stream = reader.load(src_path)
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    sh = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
            F.element_at(F.col("toks"), i + 3),
        ),
    )

    def _seed_hash(seed: int):
        # closure factory: a two-param lambda would bind the element
        # INDEX to the second arg (F.transform contract)
        def h(x):
            return F.md5(F.concat(F.lit(f"{seed}|"), x))

        return h

    sigs = (
        stream.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            *[
                F.array_min(F.transform(sh, _seed_hash(s))).alias(f"sig{s}")
                for s in range(n_seeds)
            ],
        )
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"sig{b * band_width + j}")
                        for j in range(band_width)
                    ],
                )
            ).alias("bh"),
        )
        for b in range(n_bands)
    ]
    bands = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.bh").alias("bh"))

    first_arrival = occupant == "first_arrival"

    def fn(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values("doc_id")
        cur = state.get[0] if state.exists else None
        ids, hits = [], []
        for did in rows["doc_id"]:
            did = int(did)
            ids.append(did)
            if first_arrival:
                # bucket belongs to whoever arrived first; every later
                # arrival is a flagged near-dup regardless of id
                hits.append(1 if cur is not None else 0)
                if cur is None:
                    cur = did
            else:
                hits.append(1 if (cur is not None and cur < did) else 0)
                if cur is None or did < cur:
                    cur = did
        state.update((cur,))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "band_idx": [key[0]] * len(ids),
                "hit": hits,
            }
        )

    def fn_c(key, pdfs, state: GroupState):
        # key-coarsened layout: this group's occupied buckets live as
        # parallel arrays ("band|hash" composite, occupant doc_id); the
        # fold keys on the EXACT strings, so the xxhash64 coarse key is
        # pure partitioning — a 64-bit collision can never merge two
        # buckets, only co-locate them
        rows = pd.concat(list(pdfs)).sort_values("doc_id")
        if state.exists:
            bks, occs = state.get
            st = dict(zip(bks, (int(o) for o in occs)))
        else:
            st = {}
        ids, bidx, hits = [], [], []
        for did, bi, bh in zip(rows["doc_id"], rows["band_idx"], rows["bh"]):
            did = int(did)
            bk = f"{bi}|{bh}"
            cur = st.get(bk)
            ids.append(did)
            bidx.append(int(bi))
            if first_arrival:
                hits.append(1 if cur is not None else 0)
                if cur is None:
                    st[bk] = did
            else:
                hits.append(1 if (cur is not None and cur < did) else 0)
                if cur is None or did < cur:
                    st[bk] = did
        keys = list(st)
        state.update((keys, [st[k] for k in keys]))
        yield pd.DataFrame(
            {"doc_id": ids, "band_idx": bidx, "hit": hits}
        )

    key_buckets = _resolve_key_buckets(key_buckets, state_partitions=32)
    if key_buckets is None:
        flags = bands.groupBy("band_idx", "bh").applyInPandasWithState(
            fn,
            "doc_id long, band_idx int, hit int",
            "min_id long",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    else:
        # Coarse-group the corpus-scaled bucket space: per-KEY GroupState
        # pays the ~3 ms/key plumbing constant per OCCUPIED bucket per
        # batch (2M buckets at the 100× replica ≈ 150 s measured r9 —
        # the honest re-measurement that replaced r8's stale 7.3×);
        # folding ~buckets/B buckets per invocation drops that to the
        # signature-compute floor. The feared trickle-regime crossover
        # was MEASURED in r10 (tools/profile_trickle.py, SCALING.md
        # round 10): coarse wins 1.4-2x at touched fractions >=10% and
        # +8% at 1%; per-key only wins at f~0.1% and only by 4%, in a
        # regime where ~95% of both layouts' cost is per-micro-batch
        # fixed overhead — array re-serialization is ~us/stored key, a
        # per-key GroupState round-trip ~ms/touched key. So coarse
        # stays the default everywhere; key_buckets=None remains
        # available (parity-pinned) for the one narrow regime above.
        flags = (
            bands.withColumn(
                "cg",
                F.pmod(F.xxhash64("band_idx", "bh"), F.lit(key_buckets)).cast(
                    "int"
                ),
            )
            .groupBy("cg")
            .applyInPandasWithState(
                fn_c,
                "doc_id long, band_idx int, hit int",
                "bks array<string>, occs array<long>",
                "update",
                GroupStateTimeout.NoTimeout,
            )
        )
    # state partitions sized UP for this op: its key count is
    # corpus-scaled (docs × bands — ~20k mostly-singleton buckets at
    # sf0.1, vs ~150 users for the events runners), so the per-key fn
    # cost dominates and parallelism wins (measured 16.5 → 5.6 s at
    # sf0.1 going 8 → 32)
    out = _snapshot(
        spark, flags, "update", "stream_near_dup_out", state_partitions=32
    )
    if src_dir is not None:
        import shutil

        shutil.rmtree(src_dir, ignore_errors=True)
    return out


def run_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the canonical streaming-dimension
    pattern: a live event feed joined to a slowly-changing dimension
    snapshot (customer segments), then aggregated per segment.

    Stream-static joins are STATELESS on the stream side — the static
    relation is planned like any batch side (broadcast here: a
    dimension), re-resolved per micro-batch, so no watermark or join
    state is needed; only the downstream aggregation keeps state. That
    is why this shape scales to unbounded streams where a stream-stream
    join of the same data would accumulate join state forever.

    Complete-mode memory sink over the finite source makes the result
    equal to the batch join+aggregate, which is exactly what the
    roster oracle (plain SQL on the same tables) checks.
    """
    from review_engine_spark.sources.io import read_parquet_table

    stream = _events_stream(spark, sf_dir)
    dim = read_parquet_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(
        F.broadcast(dim), stream.user_id + 1 == dim.c_custkey
    )
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).alias(
            "total_cents"
        ),
    )
    return _snapshot(spark, agg, "complete", "stream_static_out")


def run_stream_quality_gate(
    spark: SparkSession,
    sf_dir: str,
    path_glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Ingest-time document quality gating: the EXACT Gopher-rule gate
    q_gopher_rules runs in batch (``operators.curation.gopher_gate`` —
    one shared expression tree, so batch/stream parity holds by
    construction), applied inside Structured Streaming over a finite
    documents feed and driven to completion (append mode: the gate is a
    stateless narrow map, so no watermark is needed and every input row
    emits exactly one verdict row).

    This is the 100 TB/day front-door shape: filter documents AS THEY
    ARRIVE instead of landing raw text and re-scanning it in batch.
    Scale: zero state, zero shuffle — throughput is bounded by scan +
    regex only, and the file sink path (SPARK_GRAFT_STREAM_SINK=files)
    keeps the output off the driver.
    """
    from review_engine_spark.operators.curation import gopher_gate

    import os

    table_dir = os.path.join(sf_dir, path_glob)
    if os.path.isdir(table_dir):
        src_path, glob_opt = table_dir, None
    else:
        src_path, glob_opt = sf_dir, path_glob

    def _opt(r):
        return r.option("pathGlobFilter", glob_opt) if glob_opt else r

    batch = _opt(spark.read).parquet(src_path)
    reader = _opt(spark.readStream.schema(batch.schema).format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(src_path)
    return _snapshot(
        spark, gopher_gate(stream, "text", "doc_id"), "append",
        "stream_quality_gate_out",
    )


def run_stream_ingest_gate(
    spark: SparkSession,
    sf_dir: str,
    stats: tuple[DataFrame, DataFrame, DataFrame],
    cut: DataFrame,
    path_glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The composed quality+gopher+perplexity ingest gate over a
    streaming documents feed (VERDICT r10 item 3).

    Deployment shape: the bigram LM (``stats``) and the perplexity
    cutoff (``cut``) are trained OFFLINE on the standing corpus — the
    CCNet pattern, where the LM is an artifact, not a per-batch
    computation — and every micro-batch is gated through
    ``operators.curation.ingest_gate_frame`` + ``score_bigrams_against``
    via ``foreachBatch``: the per-document verdict needs no cross-batch
    state (a document's text arrives whole in one micro-batch), so the
    stream stays stateless and the per-batch plan is the EXACT batch
    expression tree — batch/stream parity by construction.

    Sink selection mirrors ``_snapshot``: ``foreachBatch`` is
    at-least-once, so the files path lands each batch idempotently in
    its own overwritten ``batch-<id>`` subdirectory and reads the union
    back through the distributed reader; the memory path accumulates
    Arrow snapshots per batch (driver-bound by design, the oracle
    contract's scale). Parity between the two is pinned in
    tests/test_streaming_sinks.py.
    """
    import atexit
    import os
    import shutil

    from review_engine_spark.operators.curation import ingest_gate_frame
    from review_engine_spark.plans.roster_curation import (
        score_bigrams_against,
    )

    cab, un, vocab_n = stats
    table_dir = os.path.join(sf_dir, path_glob)
    if os.path.isdir(table_dir):
        src_path, glob_opt = table_dir, None
    else:
        src_path, glob_opt = sf_dir, path_glob

    def _opt(r):
        return r.option("pathGlobFilter", glob_opt) if glob_opt else r

    batch = _opt(spark.read).parquet(src_path)

    def out_schema():
        # DEFERRED (round 13): analyzing the composed gate tree over
        # limit(0) costs ~2.5 s of pure Catalyst analysis — the bulk of
        # r12's +50% regression (profiled: tools/profile_ingest_gate.py)
        # — and is only needed for the empty-stream fallback, so pay it
        # there, not on every call.
        return ingest_gate_frame(
            batch.limit(0),
            score_bigrams_against(batch.limit(0), cab, un, vocab_n),
            cut,
        ).schema

    reader = _opt(spark.readStream.schema(batch.schema).format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    stream = reader.load(src_path)

    use_files = (
        os.environ.get("SPARK_GRAFT_STREAM_SINK", "memory") == "files"
    )
    # memory snapshots are keyed by batch_id (last write wins) so an
    # at-least-once batch replay is idempotent, mirroring the files
    # path's overwritten batch-<id> dirs (ADVICE r11: a plain append
    # would duplicate verdict rows on replay)
    frames: dict[int, pd.DataFrame] = {}
    landed_schema: dict[str, object] = {}  # set by land(); analysis free
    out_dir = None
    if use_files:
        out_dir = tempfile.mkdtemp(prefix="stream_ingest_gate_sink_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        gated = ingest_gate_frame(
            batch_df,
            score_bigrams_against(batch_df, cab, un, vocab_n),
            cut,
        )
        if use_files:
            gated.write.mode("overwrite").parquet(
                f"{out_dir}/batch-{batch_id}"
            )
        else:
            frames[batch_id] = gated.toPandas()
            # the contracted Spark schema, read off the already-analyzed
            # per-batch frame (pandas dtypes alone would be lossy)
            landed_schema["s"] = gated.schema

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
    if use_files:
        batch_dirs = sorted(
            os.path.join(out_dir, d)
            for d in os.listdir(out_dir)
            if d.startswith("batch-")
        )
        if not batch_dirs:
            return spark.createDataFrame([], out_schema())
        return spark.read.parquet(*batch_dirs)
    if not frames:
        return spark.createDataFrame([], out_schema())
    ordered = [frames[b] for b in sorted(frames)]
    return spark.createDataFrame(
        pd.concat(ordered, ignore_index=True), landed_schema["s"]
    )
