"""Host-state canaries shared by bench.py and the measurement tools.

Two independent brackets are needed because this host has two
independent noise sources (SCALING.md round 11):

- CPU/scheduler contention shows in the pure-Catalyst query canary
  (bench.py's q_group_count/q_dot/q_token_filter triple) but NOT in
  disk readings;
- external disk-I/O gusts on the volume backing spark.local.dir
  inflate shuffle-heavy queries 2-3x while the CPU canary stays green
  (disk canary 0.15 s quiet -> 9.7 s gusting, measured round 11 —
  tmpfs shuffle dirs collapse the spread to ±15%, proving the cause).

A measurement bracketed only by the CPU canary can therefore certify a
contended-disk pass as clean — the exact failure mode behind the r11
driver-vs-builder 22% corrected-s/q gap (VERDICT r11 item 1).
"""

from __future__ import annotations

import os
import time

#: Quiet-floor bound for the fsync canary on this host: quiet readings
#: are 0.15-0.36 s; the round-11 study showed 100x shuffle walls track
#: the pre-pass reading almost monotonically above that (0.64 s -> ~2x
#: inflation), so anything over the bound marks a disk-gusted segment.
DISK_QUIET_MAX_S = 0.35


def disk_canary(path: str = "/tmp/.disk_canary") -> float:
    """Seconds to fsync-write 64 MiB to the disk backing
    spark.local.dir. Cheap (~0.2 s quiet), and the only bracket that
    sees external disk gusts — the CPU canary cannot."""
    buf = b"\x5a" * (1 << 20)
    t0 = time.perf_counter()
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC)
    try:
        for _ in range(64):
            os.write(fd, buf)
        os.fsync(fd)
    finally:
        os.close(fd)
        os.unlink(path)
    return time.perf_counter() - t0
