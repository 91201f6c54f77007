"""Readers and writers (SURVEY §2.A, A1-A4).

The reference streams gzipped JSONL line-by-line in a Python loop
(``embed.py:55-58``, ``semantic.py:17-31``) and writes one gzip member
per file (``embed.py:84-86``). Spark's text-based JSON source handles
the gzip codec transparently and splits work across executors per file;
at 100 TB the operational guidance is many ~128 MB-1 GB .jsonl.gz parts
(gzip is not splittable, so file count = read parallelism) or, better,
Parquet with column pruning + predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from review_engine_spark.schemas import FIXTURE_SCHEMAS

__all__ = [
    "read_jsonl",
    "read_csv",
    "read_orc",
    "read_parquet_table",
    "read_tables",
    "write_jsonl_gz",
    "write_csv",
    "write_orc",
    "write_parquet",
]


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """gzip/plain JSONL scan with an explicit schema (A1-A3).

    An explicit schema avoids the full inference pass the reference's
    dynamic dicts imply, and keeps nullable numerics (price/rating/
    review_count) typed instead of string-widened.
    """
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with an explicit schema (never inferSchema — that is a
    full extra pass and widens nullable numerics to string). CSV is
    splittable when uncompressed, so unlike .jsonl.gz the read
    parallelism does not depend on file count."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar with predicate pushdown + column pruning,
    same optimizer treatment as parquet (vectorized reader, stats-based
    stripe skipping)."""
    return spark.read.orc(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: str | None = None,
) -> None:
    """CSV sink. Arrays/structs are not CSV-representable — callers
    serialize them first (``to_json``); doubles round-trip via Spark's
    shortest-repr formatter."""
    writer = df.write.mode(mode).option("header", str(header).lower())
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table; columnar scan with pushdown.

    ``events.ts`` is stored as TIMESTAMP(NANOS), which Spark's parquet
    reader has no timestamp type for — it arrives as nanosecond longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and is converted here with
    integer division (``div`` — double division would lose precision on
    ~1.7e18 ns values), truncating toward microseconds exactly like
    DuckDB's ns → µs read of the same file.

    The confs are set here at runtime (both are runtime-settable) rather
    than only at session build: callers — including an external harness —
    may hand in a SparkSession built without them. Without nanosAsLong
    the read dies with PARQUET_TYPE_ILLEGAL before the ts fixup runs;
    without a pinned UTC session timezone every timestamp/date output
    (date_trunc buckets, window frames, funnel ordering) would shift
    with the harness JVM's default zone and hash-mismatch the TZ-naive
    DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) fixture read as ns longs under nanosAsLong
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) columns (events.ts,
    # o_orderdate, l_shipdate in the round-3 fixtures) arrive as
    # TIMESTAMP_NTZ; downstream ops (unix_micros, long casts, window())
    # want the instant type, and NTZ→BIGINT casts are illegal. With the
    # session TZ pinned UTC above, this cast keeps the wall-clock —
    # identical to DuckDB's naive read of the same file.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


def read_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    names = names or list(FIXTURE_SCHEMAS)
    return {n: read_parquet_table(spark, sf_dir, n) for n in names}


def write_jsonl_gz(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """gzip-JSONL sink (A4): one JSON object per line, gzip-compressed.

    Mirrors ``embed.py:84-86``; field order follows the DataFrame schema,
    so ``select`` the desired order first.
    """
    df.write.mode(mode).option("compression", "gzip").json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
