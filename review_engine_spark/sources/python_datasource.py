"""Custom Python DataSource (PySpark 4 ``spark.dataSource`` API).

The extension point for reading systems Spark has no built-in connector
for (an internal feed, a bespoke binary format, a synthetic load
generator): implement ``DataSource`` / ``DataSourceReader``, register
once per session, then ``spark.read.format(name)`` plans it like any
other source — each ``InputPartition`` becomes a task, so the read
scales out exactly like a file scan (the reference's only "source" is
a local gzip file walk, ``embed.py:55-58``; this is the Spark-native
escape hatch for everything else).

The demonstration source is a deterministic generator: row ``g`` of
partition ``p`` carries ``val = LCG(g)/2³¹`` (the engine's shared ANSI-C
LCG), so the emitted dataset is a pure function of (parts,
rows_per_part) — reruns, any engine, and the DuckDB oracle reproduce it
bit-for-bit. Generation is per-partition and independent: no driver
bottleneck, no cross-partition coordination.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["SyntheticDocsDataSource", "register_synthetic_source"]

_M = 2147483648  # 2^31, shared with operators.mixture / chunking LCG


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.parts = int(options.get("parts", 4))
        self.rows_per_part = int(options.get("rows_per_part", 250))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        p = partition.value
        base = p * self.rows_per_part
        for i in range(self.rows_per_part):
            g = base + i
            h = ((g % _M) * 1103515245 + 12345) % _M
            yield (g, p, round(h / _M, 6))


class SyntheticDocsDataSource(DataSource):
    """``format("synthetic_docs")`` — options: parts, rows_per_part."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "row_id bigint, part int, val double"

    def reader(self, schema):  # noqa: ARG002 - fixed schema source
        return _SyntheticReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: ARG002 - fixed schema
        return _SyntheticSimpleStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent per-session registration (re-registering overwrites)."""
    spark.dataSource.register(SyntheticDocsDataSource)


class _SyntheticSimpleStreamReader:
    """Streaming half of the connector (PySpark 4
    ``SimpleDataSourceStreamReader``): offsets are plain row positions,
    ``read`` advances at most ``rows_per_batch`` per micro-batch, and
    ``readBetweenOffsets`` regenerates any [start, end) slice — the
    deterministic-replay contract that gives a custom source
    exactly-once recovery (a retried batch re-reads the identical
    rows). Same LCG rows as the batch reader, so batch, stream, and the
    DuckDB oracle all produce the same byte stream."""

    def __init__(self, options):
        self.parts = int(options.get("parts", 4))
        self.rows_per_part = int(options.get("rows_per_part", 250))
        self.batch = int(options.get("rows_per_batch", 100))
        self.total = self.parts * self.rows_per_part

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        s = int(start["offset"])
        e = min(s + self.batch, self.total)
        # a list ITERATOR, not a generator: the runtime advances and then
        # pickles the prefetched remainder to cache it for the planned
        # micro-batch, and generators don't pickle
        return iter(self._rows(s, e)), {"offset": e}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(int(start["offset"]), int(end["offset"])))

    def commit(self, end):  # noqa: ARG002 - nothing to clean up
        pass

    def _rows(self, s, e):
        return [
            (g, g // self.rows_per_part, round(((g % _M) * 1103515245 + 12345) % _M / _M, 6))
            for g in range(s, e)
        ]
