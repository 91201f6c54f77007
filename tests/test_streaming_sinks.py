"""File-sink vs memory-sink parity for the streaming runners.

The oracle gate drives every streaming runner through the default
memory-sink snapshot (driver-bound, fine at fixture scale); the 100x
stress chunk sets SPARK_GRAFT_STREAM_SINK=files to route the SAME
queries through executor-side file sinks (parquet FileStreamSink for
append mode, foreachBatch parquet writes for update/complete). These
tests pin that the two paths produce identical rows — one runner per
output mode, covering each sink branch in jobs._snapshot.
"""

import os

import pytest

from review_engine_spark.streaming import jobs


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "runner",
    [
        jobs.run_stream_dedup,  # append -> parquet FileStreamSink
        jobs.run_tumbling_count_batchlike,  # complete -> foreachBatch overwrite
        jobs.run_ewma_stateful,  # update -> foreachBatch append
    ],
    ids=["append", "complete", "update"],
)
def test_file_sink_matches_memory_sink(spark, sf_dir, runner, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SINK", raising=False)
    via_memory = _rows(runner(spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SINK", "files")
    via_files = _rows(runner(spark, sf_dir))
    assert via_files == via_memory
    assert len(via_memory) > 0


def test_file_sink_empty_stream_returns_schema(spark, sf_dir, monkeypatch):
    """A files-mode runner whose stream emits ZERO rows must return an
    empty DataFrame with the stream's schema instead of failing on
    'unable to infer schema' from an empty directory (ADVICE r7)."""
    from pyspark.sql import functions as F

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SINK", "files")
    stream = jobs._events_stream(spark, sf_dir).filter(F.lit(False)).select(
        "user_id", "event_type"
    )
    out = jobs._snapshot(spark, stream, "append", "empty_sink_test")
    assert out.columns == ["user_id", "event_type"]
    assert out.count() == 0


def test_stream_quality_gate_equals_batch_gate(spark, tmp_path):
    """The streaming gate must emit exactly the batch gate's verdicts —
    same expression tree (operators.curation.gopher_gate), streaming
    only adds delivery."""
    import pandas as pd

    from review_engine_spark.operators.curation import gopher_gate
    from review_engine_spark.streaming.jobs import run_stream_quality_gate

    ok = "the a of to and in " + "wordy " * 24  # 30 words, stops, alpha
    texts = [ok, "tiny doc", "x " * 100, ok + " zz99 " * 0]
    pd.DataFrame(
        {"doc_id": range(1, len(texts) + 1), "text": texts}
    ).to_parquet(tmp_path / "documents.parquet")

    batch = {
        (r["doc_id"], r["keep"], r["reason"])
        for r in gopher_gate(
            spark.read.parquet(str(tmp_path / "documents.parquet"))
        ).collect()
    }
    stream = {
        (r["doc_id"], r["keep"], r["reason"])
        for r in run_stream_quality_gate(spark, str(tmp_path)).collect()
    }
    assert stream == batch and len(stream) == len(texts)


def test_quality_gate_file_sink_matches_memory_sink(spark, sf_dir, monkeypatch):
    """The round-10 stream gate through both sink paths (append-mode
    parquet FileStreamSink vs memory) — identical verdict rows."""
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SINK", raising=False)
    via_memory = _rows(jobs.run_stream_quality_gate(spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SINK", "files")
    via_files = _rows(jobs.run_stream_quality_gate(spark, sf_dir))
    assert via_files == via_memory
    assert len(via_memory) > 0
