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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from review_engine_spark.schemas import fixture_schema

__all__ = ["tumbling_counts", "run_tumbling_count_batchlike", "sessionize"]


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
    # events.ts is TIMESTAMP(NANOS) in parquet → read as ns-longs and
    # convert (see sources.io.read_parquet_table)
    raw_schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    # readStream needs a directory: point at sf_dir with a glob filter
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = tumbling_counts(stream)
    name = "stream_tumbling_out"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
    # materialize before the memory sink table goes away
    out = spark.table(name)
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


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
