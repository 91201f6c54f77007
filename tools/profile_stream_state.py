"""Profile the stateful-streaming fold family at stress scale (r7 item 3).

The 100× dossier's worst remaining honest ratios are the
applyInPandasWithState folds (q_stream_ewma 25.5×, q_sessionize_state
30.9×, q_stream_anomaly 36.1× through file sinks). The named cost is
"the per-key Python fold" — this harness decomposes that claim into
measurable stages, all against the reusable K=100 replica:

  A. scan-floor     — the same stream read + projection through the
                      file sink with NO stateful operator (source +
                      sink cost only).
  B. state-noop     — applyInPandasWithState with a trivial fn: one
                      state.update per key per batch, emits one row,
                      never iterates events. Adds: the user_id shuffle,
                      Arrow group marshalling, and per-key state-store
                      round-trips — everything EXCEPT the Python loop.
  C. full fold      — the real run_ewma_stateful. C − B is the pure
                      per-event Python loop cost.

Each stage runs at the state-partition counts given by --parts
(default "8,32"): the runners' fixture-tuned default is 8, which caps
fold parallelism at 8 of 32 cores at stress scale —
SPARK_GRAFT_STATE_PARTITIONS exists exactly for this sweep.

Usage:
    STRESS_DIR=/tmp/stress100 python tools/profile_stream_state.py \
        [--parts 8,32] [--sf-dir /tmp/stress100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("STRESS_DIR", "/tmp/stress100")
    )
    ap.add_argument("--parts", default="8,32")
    args = ap.parse_args()

    import pandas as pd

    from review_engine_spark.session import get_spark
    from review_engine_spark.streaming import jobs

    os.environ["SPARK_GRAFT_STREAM_SINK"] = "files"
    spark = get_spark(
        "profile-stream-state",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g"},
    )

    n_events = (
        jobs._events_stream(spark, args.sf_dir)
        .sparkSession.read.parquet(
            os.path.join(args.sf_dir, "events.parquet")
        )
        .count()
    )
    print(f"# events: {n_events}", flush=True)

    def timed(label: str, fn) -> float:
        t0 = time.perf_counter()
        out = fn()
        n = out.count()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f} s ({n} rows)", flush=True)
        return dt

    def scan_floor():
        # stage A: stream -> projection -> file sink, no stateful op
        stream = jobs._events_stream(spark, args.sf_dir).select(
            "user_id", "ts", "event_id", "value"
        )
        return jobs._snapshot(spark, stream, "append", "prof_scan")

    def state_noop():
        # stage B: the full stateful plumbing with a constant-time fn
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )

        def fn(key, pdfs, state: GroupState):
            n = state.get[0] if state.exists else 0
            rows = 0
            for pdf in pdfs:
                rows += len(pdf)  # len() only — no per-row Python work
            state.update((n + rows,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n + rows]}
            )

        stream = jobs._events_stream(spark, args.sf_dir).select(
            "user_id", "ts", "event_id", "value"
        )
        out = stream.groupBy("user_id").applyInPandasWithState(
            fn,
            "user_id long, n_events long",
            "n long",
            "update",
            GroupStateTimeout.NoTimeout,
        )
        return jobs._snapshot(spark, out, "update", "prof_noop")

    for parts in [int(p) for p in args.parts.split(",")]:
        os.environ["SPARK_GRAFT_STATE_PARTITIONS"] = str(parts)
        print(f"\n## state partitions = {parts}", flush=True)
        timed("A scan-floor ", scan_floor)
        timed("B state-noop ", state_noop)
        # per-key = the canonical one-GroupState-entry-per-user layout;
        # kb=N / auto = the round-9 key-coarsened layout (identical
        # output, state keyed by pmod(user, N))
        timed(
            "C ewma per-key",
            lambda: jobs.run_ewma_stateful(
                spark, args.sf_dir, key_buckets=None
            ),
        )
        for kb in (128, 512):
            timed(
                f"C2 ewma kb={kb:<4}",
                lambda kb=kb: jobs.run_ewma_stateful(
                    spark, args.sf_dir, key_buckets=kb
                ),
            )
        timed(
            "D sessionize per-key",
            lambda: jobs.run_sessionize_stateful(
                spark, args.sf_dir, key_buckets=None
            ),
        )
        timed(
            "D2 sessionize auto",
            lambda: jobs.run_sessionize_stateful(spark, args.sf_dir),
        )
        timed(
            "E zscore per-key",
            lambda: jobs.run_zscore_stateful(
                spark, args.sf_dir, key_buckets=None
            ),
        )
        timed(
            "E2 zscore auto",
            lambda: jobs.run_zscore_stateful(spark, args.sf_dir),
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
