"""review_engine_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference system hyperburn777/review_engine (an
Amazon-reviews recommendation + Q&A program; see SURVEY.md for the full
operator inventory and file:line citations). Nothing here is a translation of
the reference's imperative call graph: every operator is declared through the
DataFrame/SQL API so Catalyst plans the physical execution, and model
inference lives behind Arrow-batched UDF interfaces with deterministic stubs.

Layout:
    session    — SparkSession builder (AQE, Arrow, UTC, shuffle sizing)
    schemas    — explicit StructType schemas for every table (SURVEY §1.2)
    sources    — readers/writers: Parquet, gzip-JSONL (SURVEY §2.A)
    functions  — scalar/array kernels as Column expressions (SURVEY §2.H)
    operators  — relational operator builders (joins/aggs/windows/ranking/
                 dedup/similarity/text-analysis; SURVEY §2.B-2.G, §2.K)
    inference  — Embedder/Scorer/Captioner/Chat interfaces + stubs (SURVEY §2.J)
    streaming  — Structured Streaming surface (SURVEY §2.I)
"""

__version__ = "0.1.0"
