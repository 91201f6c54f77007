"""Wall-clock breakdown of q_stream_ingest_gate (VERDICT r12 item 6:
+50-60% raw vs r11 after the batch_id-keyed snapshot change; find where
the new cost lives). Times each phase separately at sf0.1.

Usage: python tools/profile_ingest_gate.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from review_engine_spark.session import get_spark

    spark = get_spark("profile-ingest-gate")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm

    from review_engine_spark.operators.curation import ingest_gate_frame
    from review_engine_spark.plans.roster_curation import (
        _ingest_gate_inputs,
        score_bigrams_against,
    )

    def t(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s", flush=True)
        return out

    for it in range(2):
        print(f"--- iteration {it} ---")
        docs, stats, scored, cut = t(
            "inputs (plan build)", lambda: _ingest_gate_inputs(spark, sf_dir)
        )
        cab, un, vocab_n = stats
        cab, un, cut = cab.persist(), un.persist(), cut.persist()
        t("train LM (materialize cab/un/cut)", lambda: (cab.count(), un.count(), cut.count()))

        batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t(
            "out_schema analysis (limit 0)",
            lambda: ingest_gate_frame(
                batch.limit(0),
                score_bigrams_against(batch.limit(0), cab, un, vocab_n),
                cut,
            ).schema,
        )
        t(
            "batch gate toPandas (the per-batch body)",
            lambda: ingest_gate_frame(
                batch, score_bigrams_against(batch, cab, un, vocab_n), cut
            ).toPandas(),
        )

        from review_engine_spark.streaming.jobs import run_stream_ingest_gate

        out = t(
            "full streaming run",
            lambda: run_stream_ingest_gate(
                spark, sf_dir, (cab, un, vocab_n), cut
            ),
        )
        t("collect result", lambda: out.count())
        for f in (cab, un, cut):
            f.unpersist()
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
