"""Canary-bracketed 100x re-measure of the substring-dedup family
(VERDICT r10 item 1).

The round-10 embargo established that this family's 100x-side wall time
is bimodal under host contention (best-of-2 within one JVM swung
16 s -> 67 s across back-to-back JVMs while the fixture side stayed
flat). A single best-of-2 sample is therefore not a defensible ratio.
This tool takes N interleaved passes (each pass = both queries at both
scales) and BRACKETS every pass with the bench canary (q_group_count /
q_dot / q_token_filter at sf0.1, the fixed 1.35 s ruler of r9 verdict
item 4). A pass is ACCEPTED only if

  - both bracketing canaries are <= CANARY_MAX (host near its own
    steady state, not in a contention spike), and
  - the two canaries agree within CANARY_SPREAD (the spike did not
    start mid-pass).

The reported ratio is the median over accepted passes; the full
distribution is printed so SCALING.md can record the spread honestly.

Usage:
    STRESS_DIR=/tmp/stress100 python tools/measure_substring.py [N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"
RULER = 1.35  # the fixed canary reference (SCALING.md r9 item 4)
CANARY_MAX = 2.4  # accept passes when the host is <=~1.8x the ruler
CANARY_SPREAD = 0.12  # bracketing canaries must agree within 12%
# Quiet-floor disk bound: the 100x wall tracks the pre-pass disk canary
# almost monotonically (0.16 s -> dedup 5.65 s; 0.64 s -> 11.9 s;
# 0.99 s -> 13.2 s), so a 1.2 s bound admitted 2x-inflated samples.
# Quiet readings on this host are 0.15-0.36 s.
QUERIES = ["q_substring_dedup", "q_substring_scrub"]

from tools.canaries import DISK_QUIET_MAX_S as DISK_MAX  # noqa: E402
from tools.canaries import disk_canary  # noqa: E402


def main() -> int:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    stress_dir = os.environ.get("STRESS_DIR", "/tmp/stress100")
    if not Path(stress_dir, "SALT_VERSION").exists():
        print(f"no replica at {stress_dir}", file=sys.stderr)
        return 2

    import __spark_entry__ as entrymod
    from review_engine_spark.session import get_spark

    spark = get_spark(
        "measure-substring",
        shuffle_partitions=min(1024, 32 * 25),
        extra_conf={"spark.driver.memory": "24g"},
    )
    qs = entrymod.queries()
    canary_names = ["q_group_count", "q_dot", "q_token_filter"]

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def canary() -> float:
        t0 = time.perf_counter()
        for c in canary_names:
            qs[c](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        return time.perf_counter() - t0

    # Warm-up: pay codegen JIT + page in the replica so pass 0 is not a
    # cold outlier by construction.
    canary()
    canary()
    for q in QUERIES:
        for d in (SF_DIR, stress_dir):
            run(q, d)
    spark.catalog.clearCache()

    # Accepted passes ACCUMULATE across invocations (state file): the
    # host's external disk gusts recur every minute or two, so one
    # invocation rarely lands >=2 quiet passes — but quiet passes from
    # different invocations are only valid joint samples of the SAME
    # binary + replica, so the state is stamped with the replica's
    # SALT_VERSION and the repo HEAD and discarded on mismatch
    # (ADVICE r11: un-stamped state silently mixed samples from a
    # prior build or regenerated replica into the reported median).
    import json
    import subprocess

    salt = Path(stress_dir, "SALT_VERSION").read_text().strip()
    try:
        head = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:  # noqa: BLE001 — not a checkout: stamp salt only
        head = "no-git"
    stamp = f"{salt}|{head}"

    state_path = Path("/tmp/measure_substring_state.json")
    samples: dict[str, list[tuple[float, float]]] = {q: [] for q in QUERIES}
    accepted = 0
    if state_path.exists():
        prior = json.loads(state_path.read_text())
        if prior.get("_stamp") == stamp:
            for q in QUERIES:
                samples[q] = [tuple(s) for s in prior.get(q, [])]
            accepted = prior.get("_accepted", 0)
            print(f"(resuming with {accepted} prior accepted passes)")
        else:
            print(
                f"(discarding prior state: stamp {prior.get('_stamp')!r}"
                f" != {stamp!r})"
            )
    for p in range(n_passes):
        c0, d0 = canary(), disk_canary()
        t = {}
        for q in QUERIES:
            t[q] = (run(q, SF_DIR), run(q, stress_dir))
        spark.catalog.clearCache()
        c1, d1 = canary(), disk_canary()
        ok = (
            c0 <= CANARY_MAX
            and c1 <= CANARY_MAX
            and abs(c1 - c0) / max(c0, c1) <= CANARY_SPREAD
            and d0 <= DISK_MAX
            and d1 <= DISK_MAX
        )
        tag = "ACCEPT" if ok else "REJECT"
        print(
            f"pass {p}: canary {c0:.2f}/{c1:.2f}s (ruler {RULER}), "
            f"disk {d0:.2f}/{d1:.2f}s -> {tag}",
            flush=True,
        )
        for q in QUERIES:
            fx, hx = t[q]
            print(
                f"    {q}: {fx:.2f}s -> {hx:.2f}s = {hx / fx:.1f}x",
                flush=True,
            )
            if ok:
                samples[q].append((fx, hx))
        if ok:
            accepted += 1
            state = {q: samples[q] for q in QUERIES}
            state["_accepted"] = accepted
            state["_stamp"] = stamp
            state_path.write_text(json.dumps(state))

    print(f"\naccepted {accepted} passes total (incl. prior invocations)")
    if accepted < 2:
        print("INSUFFICIENT quiet passes — do not record", flush=True)
        return 1
    for q in QUERIES:
        fxs = [s[0] for s in samples[q]]
        hxs = [s[1] for s in samples[q]]
        ratios = sorted(h / f for f, h in samples[q])
        med = statistics.median(ratios)
        spread = (max(hxs) - min(hxs)) / statistics.median(hxs)
        print(
            f"{q}: fixture med {statistics.median(fxs):.2f}s, "
            f"100x med {statistics.median(hxs):.2f}s "
            f"(spread {spread:.0%}), ratios {['%.1f' % r for r in ratios]} "
            f"-> median {med:.1f}x"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
