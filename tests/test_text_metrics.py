"""Tests: readability metrics (q_readability) — the fixture corpus has
no sentence punctuation, so the [.!?]+ branch is exercised here."""

from __future__ import annotations

import pandas as pd
import pytest

from review_engine_spark.plans.roster_text import q_readability


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {"doc_id": range(1, len(texts) + 1), "text": texts}
    ).to_parquet(tmp_path / "documents.parquet")


def test_readability_hand_corpus(spark, tmp_path):
    _write_docs(
        tmp_path,
        [
            "Hello world. This is fine!",  # 5 words, 2 sentences, 7 syl
            "zz zz",                       # no vowels, no punctuation
        ],
    )
    out = {r["doc_id"]: r for r in q_readability(spark, str(tmp_path)).collect()}

    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 7)
    wps, spw = 5 / 2, 7 / 5
    assert r1["flesch"] == pytest.approx(206.835 - 1.015 * wps - 84.6 * spw, rel=1e-12)
    assert r1["fk_grade"] == pytest.approx(0.39 * wps + 11.8 * spw - 15.59, rel=1e-12)

    r2 = out[2]
    # sentence floor of 1; zero syllables is legal
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (2, 1, 0)
    assert r2["flesch"] == pytest.approx(206.835 - 1.015 * 2, rel=1e-12)


def test_readability_skips_empty_docs(spark, tmp_path):
    _write_docs(tmp_path, ["", "   ", "one oh."])
    out = q_readability(spark, str(tmp_path)).collect()
    # empty/whitespace-only docs have 0 words -> excluded
    assert [r["doc_id"] for r in out] == [3]
