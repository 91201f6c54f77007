"""Source-level convention guards (no SparkSession needed).

Each guard locks a cross-engine determinism rule that was learned from
a real gate failure, so the rule survives contributor turnover instead
of living only in NOTES.md.
"""

from __future__ import annotations

import re
from pathlib import Path

PLANS = Path(__file__).resolve().parent.parent / "review_engine_spark" / "plans"


def test_no_round_on_fold_outputs():
    """round() must never wrap a bit-identical fold (list_reduce /
    F.aggregate recurrence): both engines produce the same raw double,
    and rounding ADDS a divergence boundary — Spark rounds the shortest
    decimal repr half-up while DuckDB multiplies by 10^k first, and the
    float64 product can cross .5 where the decimal digits don't
    (round-8 second-seed sf0.1 catch: round(35.459430499999996, 6) →
    .459430 vs .459431). Raw fold doubles compare hash-exact; round()
    is reserved for order-dependent sums and transcendental outputs.
    """
    offenders = []
    for p in PLANS.glob("*.py"):
        s = p.read_text()
        for m in re.finditer(r"round\(\s*list_reduce", s):
            offenders.append(f"{p.name}:{s[: m.start()].count(chr(10)) + 1}")
    assert not offenders, (
        "oracle round() wrapping a list_reduce fold (see NOTES.md round-8"
        f" rounding lesson): {offenders}"
    )


def test_no_bare_double_to_bigint_cast_in_new_oracles():
    """Money-ish doubles must be floor(x*100+0.5)-quantized before any
    BIGINT cast (Spark CAST truncates toward zero, DuckDB rounds
    half-away — round-6 sweep). This guard only checks the cheap
    grep-able pattern: a cast of a bare division result.
    """
    offenders = []
    pat = re.compile(r"CAST\(\s*\w+\s*/\s*\w+(\.\w+)?\s+AS BIGINT\)", re.I)
    for p in PLANS.glob("*.py"):
        s = p.read_text()
        for m in pat.finditer(s):
            line = s[: m.start()].count(chr(10)) + 1
            ctx = s[max(0, m.start() - 200) : m.start()]
            # floor/ceil-quantized or integer-operand casts are the
            # documented sound forms (NOTES round-6 sweep)
            if "floor(" in ctx or "ceil(" in ctx or "//" in ctx:
                continue
            offenders.append(f"{p.name}:{line}")
    # the round-6 sweep documented the surviving sound instances; new
    # code should quantize instead of growing this list
    allowed = 2
    assert len(offenders) <= allowed, (
        "new bare double->BIGINT cast in an oracle (quantize with"
        f" floor(x*100+0.5) first — NOTES round-6): {offenders}"
    )
