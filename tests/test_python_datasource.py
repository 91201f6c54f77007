"""Custom Python DataSource: partition-parallel, partitioning-invariant."""

from __future__ import annotations

from review_engine_spark.sources.python_datasource import (
    register_synthetic_source,
)

_M = 2147483648


def _read(spark, parts, rows_per_part):
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("parts", str(parts))
        .option("rows_per_part", str(rows_per_part))
        .load()
    )


def test_synthetic_source_matches_lcg_and_parallelizes(spark):
    df = _read(spark, 3, 40)
    assert df.rdd.getNumPartitions() == 3  # one task per InputPartition
    rows = {r["row_id"]: (r["part"], r["val"]) for r in df.collect()}
    assert len(rows) == 120
    for g in (0, 39, 40, 119):
        h = ((g % _M) * 1103515245 + 12345) % _M
        assert rows[g] == (g // 40, round(h / _M, 6))


def test_synthetic_source_value_set_invariant_to_partitioning(spark):
    """(row_id, val) pairs depend only on the global row index — carving
    the same 120 rows into 3 or 6 partitions changes nothing but
    parallelism."""
    a = {(r["row_id"], r["val"]) for r in _read(spark, 3, 40).collect()}
    b = {(r["row_id"], r["val"]) for r in _read(spark, 6, 20).collect()}
    assert a == b


def test_stream_reader_replay_contract():
    """readBetweenOffsets must regenerate exactly the rows the original
    read() emitted for the same offset range — the exactly-once
    recovery contract — and the concatenated micro-batches must equal
    the batch reader's full output."""
    from review_engine_spark.sources.python_datasource import (
        _SyntheticReader,
        _SyntheticSimpleStreamReader,
    )

    opts = {"parts": "4", "rows_per_part": "250", "rows_per_batch": "100"}
    r = _SyntheticSimpleStreamReader(opts)
    off = r.initialOffset()
    all_rows, batches = [], 0
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows:
            assert nxt == off  # idle source: offset must not advance
            break
        assert list(r.readBetweenOffsets(off, nxt)) == rows
        all_rows.extend(rows)
        off = nxt
        batches += 1
    assert batches == 10
    batch_rows = [
        row
        for p in _SyntheticReader(opts).partitions()
        for row in _SyntheticReader(opts).read(p)
    ]
    assert sorted(all_rows) == sorted(batch_rows)


def test_stream_source_checkpoint_recovery(spark, tmp_path):
    """Offsets continue across a query restart: run 1 drains a 500-row
    stream to a parquet sink; run 2 reuses the SAME checkpoint against a
    grown (1000-row) source and must append exactly rows 500..999 —
    no re-emission, no gap (exactly-once across restarts)."""
    from review_engine_spark.sources.python_datasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain(parts: int) -> None:
        stream = (
            spark.readStream.format("synthetic_docs")
            .option("parts", str(parts))
            .option("rows_per_part", "250")
            .option("rows_per_batch", "100")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    drain(parts=2)
    first = spark.read.parquet(out)
    assert first.count() == 500
    drain(parts=4)
    final = spark.read.parquet(out)
    ids = sorted(r["row_id"] for r in final.collect())
    assert ids == list(range(1000))  # each row exactly once, in total
