"""Per-query quiet-floor 100x measurement (VERDICT r11 item 3 —
generalizes tools/measure_substring.py to ANY roster query list).

Interleaved passes of each named query at sf0.1 and the K=100 replica,
every pass DOUBLE-bracketed:

- CPU canary (bench.py's q_group_count/q_dot/q_token_filter triple
  against the fixed 1.35 s ruler) — rejects scheduler-contended passes;
- fsync disk canary (tools/canaries.py) — rejects passes taken during
  the host's external disk-I/O gusts, which inflate shuffle-heavy 100x
  walls 2-3x while the CPU canary stays green (round-11 diagnosis).

Accepted passes accumulate across invocations in a state file stamped
with the replica SALT_VERSION + repo HEAD (discarded on mismatch); the
reported ratio is the median over accepted passes with the full spread
printed, the SCALING.md recording convention.

Usage:
    STRESS_DIR=/tmp/stress100 python tools/measure_quiet.py [-n N] q1 q2 ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.canaries import DISK_QUIET_MAX_S, disk_canary  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
RULER = 1.35  # fixed CPU canary reference (SCALING.md r9 item 4)
CANARY_MAX = 2.4
CANARY_SPREAD = 0.12


def main() -> int:
    args = sys.argv[1:]
    n_passes = 5
    if args and args[0] == "-n":
        n_passes = int(args[1])
        args = args[2:]
    queries = args
    if not queries:
        print("usage: measure_quiet.py [-n N] query ...", file=sys.stderr)
        return 2
    stress_dir = os.environ.get("STRESS_DIR", "/tmp/stress100")
    if not Path(stress_dir, "SALT_VERSION").exists():
        print(f"no replica at {stress_dir}", file=sys.stderr)
        return 2

    import json
    import subprocess

    import __spark_entry__ as entrymod
    from review_engine_spark.session import get_spark

    spark = get_spark(
        "measure-quiet",
        shuffle_partitions=min(1024, 32 * 25),
        extra_conf={"spark.driver.memory": "24g"},
    )
    qs = entrymod.queries()
    missing = [q for q in queries if q not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2
    canary_names = ["q_group_count", "q_dot", "q_token_filter"]

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def canary() -> float:
        t0 = time.perf_counter()
        for c in canary_names:
            qs[c](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    salt = Path(stress_dir, "SALT_VERSION").read_text().strip()
    try:
        head = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:  # noqa: BLE001
        head = "no-git"
    stamp = f"{salt}|{head}"

    state_path = Path("/tmp/measure_quiet_state.json")
    samples: dict[str, list[tuple[float, float]]] = {q: [] for q in queries}
    if state_path.exists():
        prior = json.loads(state_path.read_text())
        if prior.get("_stamp") == stamp:
            for q in queries:
                samples[q] = [tuple(s) for s in prior.get(q, [])]
            n_prior = sum(len(v) for v in samples.values())
            print(f"(resuming with {n_prior} prior accepted samples)")
        else:
            print(
                f"(discarding prior state: stamp {prior.get('_stamp')!r}"
                f" != {stamp!r})"
            )
            prior = {}
    else:
        prior = {}

    # warm-up: codegen JIT + page in both corpora
    canary()
    canary()
    for q in queries:
        for d in (SF_DIR, stress_dir):
            run(q, d)
    spark.catalog.clearCache()

    for p in range(n_passes):
        c0, d0 = canary(), disk_canary()
        t = {}
        for q in queries:
            t[q] = (run(q, SF_DIR), run(q, stress_dir))
        spark.catalog.clearCache()
        c1, d1 = canary(), disk_canary()
        ok = (
            c0 <= CANARY_MAX
            and c1 <= CANARY_MAX
            and abs(c1 - c0) / max(c0, c1) <= CANARY_SPREAD
            and d0 <= DISK_QUIET_MAX_S
            and d1 <= DISK_QUIET_MAX_S
        )
        tag = "ACCEPT" if ok else "REJECT"
        print(
            f"pass {p}: canary {c0:.2f}/{c1:.2f}s (ruler {RULER}), "
            f"disk {d0:.2f}/{d1:.2f}s -> {tag}",
            flush=True,
        )
        for q in queries:
            fx, hx = t[q]
            print(f"    {q}: {fx:.2f}s -> {hx:.2f}s = {hx / fx:.1f}x", flush=True)
            if ok:
                samples[q].append((fx, hx))
        if ok:
            state = dict(prior)
            state.update({q: samples[q] for q in queries})
            state["_stamp"] = stamp
            state_path.write_text(json.dumps(state))

    insufficient = [q for q in queries if len(samples[q]) < 2]
    if insufficient:
        print(
            f"\nINSUFFICIENT quiet samples for {insufficient} — do not record",
            flush=True,
        )
        return 1
    print()
    for q in queries:
        fxs = sorted(s[0] for s in samples[q])
        hxs = sorted(s[1] for s in samples[q])
        ratios = sorted(h / f for f, h in samples[q])
        spread = (max(hxs) - min(hxs)) / statistics.median(hxs)
        print(
            f"{q}: fixture med {statistics.median(fxs):.2f}s, "
            f"100x med {statistics.median(hxs):.2f}s, "
            f"ratio med {statistics.median(ratios):.1f}x "
            f"(n={len(ratios)}, 100x spread ±{spread * 50:.0f}%)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
