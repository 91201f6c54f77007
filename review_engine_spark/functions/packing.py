"""Packed-BIGINT pair keys — the 8-byte shuffle-key idiom with its
bound made EXPLICIT and ENFORCED.

Several graph-ish operators enumerate within-group id pairs as one
``u * 2^32 + v`` long (long-keyed hash aggregates measured ~10× faster
than struct-keyed ones, and the shuffle row shrinks to 16 bytes). The
encoding is only injective while ``0 <= u < 2^31`` (the multiply
overflows signed 64-bit at 2^31) and ``0 <= v < 2^32`` (div/mod
aliases beyond) — bounds TPC-H custkeys at SF ~30k+ can exceed
(ADVICE r10). Rather than silently corrupting pairs at exactly the
scale the plans target, ``pack_pair`` guards every encode with
``assert_true``: a job that would corrupt FAILS with a named error, and
the caller either remaps ids into range or switches to struct keys.
The guard is a per-element codegen branch on values already in
registers — noise next to the explode it feeds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["pack_pair", "unpack_pair", "PACK_BASE"]

#: 2^32 — the v-radix. u must stay below 2^31, v below 2^32.
PACK_BASE = 4294967296


def pack_pair(u: Column, v: Column) -> Column:
    """``u * 2^32 + v`` with an overflow/alias guard: raises (via
    ``assert_true``) instead of silently corrupting when ``u >= 2^31``
    or ``v >= 2^32`` or either is negative. Usable inside higher-order
    lambdas (operands are plain element variables)."""
    ok = (
        (u >= 0)
        & (u < F.lit(PACK_BASE // 2))
        & (v >= 0)
        & (v < F.lit(PACK_BASE))
    )
    guard = F.assert_true(
        ok,
        F.concat(
            F.lit("pack_pair overflow: id out of [0,2^31)x[0,2^32) — "),
            u.cast("string"),
            F.lit(","),
            v.cast("string"),
        ),
    )
    # assert_true returns NULL on success; anchoring the result on it
    # keeps the guard in the expression tree (it would be pruned as
    # unused otherwise)
    return F.when(guard.isNull(), u * F.lit(PACK_BASE) + v)


def unpack_pair(packed: str) -> tuple[Column, Column]:
    """Exact integer div/mod decode (no double round-trip)."""
    return (
        F.expr(f"{packed} div {PACK_BASE}"),
        F.expr(f"{packed} % {PACK_BASE}"),
    )
