"""Product-blurb summarization surface (SURVEY §2.J J4, §3.1 tail, M5).

The reference builds a LLaVA chat-template prompt from product
name/category/rating plus a tone instruction (summarize.py:38-59), feeds
one fetched image (summarize.py:28-35, capped at 1 of max 3), generates
64 greedy tokens (summarize.py:86-88), then extracts the blurb with the
H10/H11 kernels (summarize.py:13-25).

Engine form: prompt assembly is pure ``format_string`` (testable without
any model); the image path is the multimodal binary column pipeline
(operators.multimodal) placed AFTER the final limit; generation is the
Arrow-batched chat UDF (stubbed — swap for a VLM ``predict_batch_udf``
in production); extraction is ``functions.text.extract_summary``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from review_engine_spark.functions.text import extract_summary
from review_engine_spark.inference.stubs import stub_chat_udf

__all__ = ["BLURB_TEMPLATE", "build_blurb_prompt", "summarize_products"]

#: Blurb prompt shape (summarize.py:38-59 semantics: product name,
#: category, rating and a tone word driving a 15-20-word blurb; engine's
#: own wording).
BLURB_TEMPLATE = (
    "USER: <image>\nWrite a %s 15-20 word blurb for %s "
    "(category: %s, rating: %s/5).\nASSISTANT:"
)


def build_blurb_prompt(
    name: Column, category: Column, rating: Column, tone: Column
) -> Column:
    """J4 prompt assembly as format_string — pure and null-tolerant: a
    missing rating renders as 'n/a' (the reference tolerates absent meta
    fields, rank.py:21-27)."""
    rating_str = F.coalesce(
        F.format_number(rating.cast("double"), 1), F.lit("n/a")
    )
    return F.format_string(
        BLURB_TEMPLATE,
        tone,
        F.coalesce(name, F.lit("this product")),
        F.coalesce(category, F.lit("general")),
        rating_str,
    )


def summarize_products(
    top: DataFrame,
    name_col: str,
    category_col: str,
    rating_col: str,
    tone: str = "friendly",
) -> DataFrame:
    """Blurb generation over an already-limited product set.

    By construction the caller passes the post-limit DataFrame (the
    reference summarizes only the displayed top-3, semantic.py:58-64) —
    the chat UDF therefore runs on ≤ k rows, never the corpus
    (SURVEY §4.3.3 placement invariant).
    """
    prompted = top.withColumn(
        "prompt",
        build_blurb_prompt(
            F.col(name_col),
            F.col(category_col),
            F.col(rating_col),
            F.lit(tone),
        ),
    )
    chat = stub_chat_udf()
    return prompted.withColumn(
        "blurb", extract_summary(chat(F.col("prompt")))
    ).drop("prompt")
