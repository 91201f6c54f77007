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


def test_ingest_gate_file_sink_matches_memory_sink(spark, sf_dir, monkeypatch):
    """The round-11 composed ingest gate through both sink paths
    (foreachBatch batch-<id> parquet landings vs per-batch Arrow
    snapshots) — identical verdict rows."""
    from review_engine_spark.plans.roster_curation import q_stream_ingest_gate

    monkeypatch.delenv("SPARK_GRAFT_STREAM_SINK", raising=False)
    via_memory = _rows(q_stream_ingest_gate(spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SINK", "files")
    via_files = _rows(q_stream_ingest_gate(spark, sf_dir))
    assert via_files == via_memory
    assert len(via_memory) > 0


def test_ingest_gate_multibatch_equals_batch_twin(spark, tmp_path):
    """Multi-micro-batch delivery (maxFilesPerTrigger=1 over a
    several-file corpus) must emit exactly the batch twin's verdicts:
    the LM artifact + cutoff are trained once on the standing corpus,
    so per-batch gating is the identical expression tree per document.
    Also pins union-of-reasons: a doc failing several gates reports
    every gate's first-failing reason, prefixed."""
    import pandas as pd

    from review_engine_spark.operators.curation import ingest_gate_frame
    from review_engine_spark.plans.roster_curation import (
        _rank_cutoff,
        score_bigrams_against,
        train_bigram_stats,
    )
    from review_engine_spark.streaming.jobs import run_stream_ingest_gate
    import pyspark.sql.functions as F

    ok = ("the a of to and in " + "wordy common text here " * 10).strip()
    texts = [
        ok * 3,               # long enough, stopwords, alpha
        "tiny doc",           # fails everything short
        "x " * 120,           # no stopwords, low quality
        ok * 3,               # duplicate of 1 — same verdict
        ("9 8 7 " * 40).strip(),  # numeric: low_alpha + und lang
    ]
    docs_pd = pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "n_chars": [len(t) for t in texts],
        }
    )
    corpus = tmp_path / "documents.parquet"
    corpus.mkdir()
    # several part files so maxFilesPerTrigger=1 yields real multi-batch
    for i in range(3):
        docs_pd.iloc[i::3].to_parquet(corpus / f"part-{i}.parquet")

    docs = spark.read.parquet(str(corpus))
    stats = train_bigram_stats(docs)
    scored = score_bigrams_against(docs, *stats)
    cut = _rank_cutoff(
        scored.select("doc_id", F.col("bigram_logprob").alias("_lp")),
        "_lp", 3, 10,
    )
    batch = sorted(
        tuple(r) for r in ingest_gate_frame(docs, scored, cut).collect()
    )
    stream = sorted(
        tuple(r)
        for r in run_stream_ingest_gate(
            spark, str(tmp_path), stats, cut, max_files_per_trigger=1
        ).collect()
    )
    assert stream == batch and len(stream) == len(texts)
    reasons = {r[0]: r[2] for r in batch}
    keeps = {r[0]: r[1] for r in batch}
    assert keeps[2] is False
    # union-of-reasons: the tiny doc fails quality AND gopher AND has no
    # bigram evidence strong enough to pass — every prefix present
    assert reasons[2].startswith("quality:too_short,gopher:too_few_words")
    assert keeps[1] == keeps[4] and reasons[1] == reasons[4]
