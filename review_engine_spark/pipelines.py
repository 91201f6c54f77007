"""Reference-shaped end-to-end pipelines (SURVEY §3.1-§3.3).

A user of the reference system drives three flows: the offline embedding
build (``python embed.py``), the recommendation query, and the per-product
Q&A loop (``python semantic.py``). These functions are those flows over
the reference's own data shapes (schemas.REVIEW_SCHEMA /
PRODUCT_META_SCHEMA / EMBEDDING_SCHEMA), composed from the same operator
builders the declared-query roster verifies.

Everything stays one lazy DataFrame lineage per flow; the only
materialization barriers are the ≤``candidates`` collect for MMR (the
reference's own top-200 cut) and the Arrow-batched inference UDFs
(SURVEY §3.1 mapping). Models are injected — pass real
``predict_batch_udf`` wrappers in production, the deterministic stubs in
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from review_engine_spark.functions.scoring import (
    MAX_STAR_RATING,
    bayesian_rating,
    blend_score,
    log_popularity,
    minmax_normalize,
    price_fit,
)
from review_engine_spark.functions.text import clean_text, parse_budget, token_count
from review_engine_spark.functions.vector import cosine_similarity
from review_engine_spark.operators.ranking import mmr_diversify, priced_first, top_k_by

__all__ = [
    "build_product_embeddings",
    "recommend",
    "qa_answer",
    "curate_corpus",
]


def build_product_embeddings(
    reviews: DataFrame,
    embed_udf,
    min_tokens: int = 5,
) -> DataFrame:
    """§3.3 offline ETL (embed.py:55-86): reviews → cleaned title+text →
    token filter → per-review embed (Arrow-batched UDF) → per-product
    mean-pool → ``(parent_asin, embed)``.

    The reference encodes per-product in a Python loop (embed.py:68-82);
    here the embed UDF runs once over the cleaned corpus and the pooling
    is the relational D2 plan — two aggregations on (asin, pos) / (asin),
    12-byte rows, map-side combined.
    """
    cleaned = reviews.select(
        "parent_asin",
        clean_text(
            F.concat_ws(" ", F.col("title"), F.col("text"))
        ).alias("clean"),
    ).filter(token_count(F.col("clean")) > min_tokens)
    embedded = cleaned.select(
        "parent_asin", embed_udf(F.col("clean")).alias("vec")
    )
    exploded = embedded.select(
        "parent_asin", F.posexplode("vec").alias("pos", "val")
    )
    pooled = exploded.groupBy("parent_asin", "pos").agg(
        F.avg("val").alias("v")
    )
    return pooled.groupBy("parent_asin").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s.v
        ).alias("embed")
    )


def recommend(
    spark: SparkSession,
    products: DataFrame,
    embeddings: DataFrame,
    query: str,
    query_vec: list[float],
    rerank_udf=None,
    candidates: int = 200,
    k: int = 10,
    display: int = 3,
) -> DataFrame:
    """§3.1 recommendation query (semantic.py:33-67 → rank.py:208-337).

    cosine retrieval vs the broadcast query vector → top-``candidates``
    cut (TakeOrderedAndProject) → optional rerank UDF AFTER the cut →
    left-outer metadata join (broadcast; missing meta tolerated) → budget
    anchor from the query text ∥ median/std price stats (1-row broadcast
    aggregate) → Bayesian rating, log-popularity, price fit → weighted
    blend → MMR diversification (driver-side over the collected cut) →
    priced-first ordering → top-``display``.

    Returns (rank, parent_asin, title, price, score, price_missing).
    """
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        "parent_asin",
        F.col("embed"),
        F.round(cosine_similarity(F.col("embed"), qv), 6).alias("sim"),
    )
    cut = top_k_by(scored, "sim", "parent_asin", candidates)

    meta = products.select(
        F.col("parent_asin").alias("m_asin"),
        "title",
        "summary",
        "price",
        "rating",
        "review_count",
    )
    joined = cut.join(
        F.broadcast(meta), cut.parent_asin == meta.m_asin, "left"
    ).drop("m_asin")

    if rerank_udf is not None:
        # rank.py:22-29: empty meta → empty rerank document, never a skip
        doc = F.concat_ws(
            " ", F.coalesce(F.col("title"), F.lit("")), F.coalesce(F.col("summary"), F.lit(""))
        )
        joined = joined.withColumn("rerank_raw", rerank_udf(F.lit(query), doc))
    else:
        joined = joined.withColumn("rerank_raw", F.col("sim"))

    stats = joined.agg(
        F.median("price").alias("anchor_fallback"),
        F.stddev_pop("price").alias("price_sd"),
        F.percentile("rerank_raw", F.lit(0.01)).alias("rr_p1"),
        F.percentile("rerank_raw", F.lit(0.99)).alias("rr_p99"),
        F.max(log_popularity(F.col("review_count"))).alias("pop_hi"),
        F.min(log_popularity(F.col("review_count"))).alias("pop_lo"),
    )
    budget = F.round(parse_budget(F.lit(query)), 6)
    feat = joined.crossJoin(F.broadcast(stats)).withColumn(
        "anchor", F.coalesce(budget, F.col("anchor_fallback"))
    )
    blended = feat.select(
        "parent_asin",
        "embed",
        "title",
        "price",
        F.col("price").isNull().alias("price_missing"),
        F.round(
            blend_score(
                sim=F.col("sim"),
                bayes_rating_scaled=bayesian_rating(
                    F.col("rating"), F.col("review_count")
                )
                / MAX_STAR_RATING,
                pop_norm=minmax_normalize(
                    log_popularity(F.col("review_count")),
                    F.col("pop_lo"),
                    F.col("pop_hi"),
                ),
                price_fit_score=price_fit(
                    F.col("price"), F.col("anchor"), F.col("price_sd")
                ),
                rerank_norm=minmax_normalize(
                    F.col("rerank_raw"), F.col("rr_p1"), F.col("rr_p99")
                ),
            ),
            6,
        ).alias("score"),
    )

    diversified = mmr_diversify(
        spark, blended, "parent_asin", "score", "embed", k=k
    )
    # re-attach display fields, order priced-first within MMR order
    final = diversified.join(
        blended.select("parent_asin", "title", "price", "price_missing"),
        "parent_asin",
    )
    ordered = priced_first(final, "price", "mmr_rank").limit(display)
    w = Window.orderBy(F.col("price_missing").asc(), F.col("mmr_rank").asc())
    return ordered.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "parent_asin",
        "title",
        "price",
        "score",
        "price_missing",
    )


def qa_answer(
    chunks: DataFrame,
    question: str,
    product_asin: str | None = None,
    k: int = 4,
) -> DataFrame:
    """§3.2 Q&A flow (semantic.py:76-106 → rag.py:42-57): filter the
    persistent chunks table to the focused product (the reference's
    per-switch Chroma rebuild, rag.py:49-52, disappears), then the
    retrieve → prompt → chat → extract chain."""
    from review_engine_spark.operators.rag import rag_answer

    scoped = (
        chunks.filter(F.col("parent_asin") == product_asin)
        if product_asin is not None
        else chunks
    )
    return rag_answer(scoped, question, k=k)


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 16,
    boiler_span: int = 8,
    boiler_min_docs: int = 2,
    boiler_max_ratio: float = 0.3,
    min_quality: float = 0.2,
    train: float = 0.9,
    val: float = 0.05,
) -> DataFrame:
    """End-to-end pretraining-corpus curation, composed from the
    oracle-verified operators — the pipeline a corpus team would run
    before tokenization:

      PII scrub → exact dedup (min-id survivor per content hash)
      → duplicated-span removal → boilerplate-ratio gate
      → quality-score gate → deterministic train/val/test split.

    One lazy lineage; the shuffles are the dedup winner elections and
    the boilerplate doc-frequency join (all keyed on span/content
    hashes, never payload-wide), everything else is narrow. Returns
    ``(id, text, n_redactions, n_chunks, n_kept, boiler_ratio,
    quality, split)`` for the surviving documents. Note the output text
    is lower-cased: the span stage reassembles from normalized chunks.
    """
    from review_engine_spark.operators.chunking import assign_split
    from review_engine_spark.operators.curation import (
        boilerplate_flags,
        span_dedup,
    )
    from review_engine_spark.operators.dedup import exact_dedup
    from review_engine_spark.operators.textstats import quality_score
    from review_engine_spark.functions.text import scrub_pii

    scrubbed, n_red = scrub_pii(F.col(text_col))
    base = docs.select(
        F.col(id_col), scrubbed.alias("text"), n_red.alias("n_redactions")
    )
    survivors = exact_dedup(base, "text", id_col).select(id_col)
    base = base.join(survivors, id_col, "left_semi")

    deduped = (
        span_dedup(base, "text", id_col, span=span)
        .filter(F.col("n_kept") > 0)
        .select(
            F.col(id_col),
            F.col("text_dedup").alias("text"),
            "n_chunks",
            "n_kept",
        )
        .join(base.select(id_col, "n_redactions"), id_col)
    )

    flags = boilerplate_flags(
        deduped,
        "text",
        id_col,
        span=boiler_span,
        min_docs=boiler_min_docs,
        max_ratio=boiler_max_ratio,
    )
    gated = deduped.join(
        flags.filter(F.col("keep")).select(id_col, "boiler_ratio"), id_col
    )

    scored = gated.withColumn(
        "quality", F.round(quality_score(F.col("text")), 6)
    ).filter(F.col("quality") >= min_quality)
    return assign_split(scored, id_col, train=train, val=val)
