"""Guards on the driver-facing registry ordering (plans/__init__.py).

The harness checks only the FIRST 50 oracle entries per round, so window
management is correctness-critical: a typo in ``_TIER1_FIXED`` or
``_DRIVER_GREEN`` silently drops a slot (the ordering helper skips
unknown names), and a query that loses its oracle entry silently
downgrades the check. These tests fail loudly instead.
"""

from __future__ import annotations


def test_tier1_names_all_registered():
    from review_engine_spark.plans import ORACLES, QUERIES, _TIER1_FIXED

    missing = [n for n in _TIER1_FIXED if n not in QUERIES]
    assert not missing, f"_TIER1_FIXED names not in QUERIES: {missing}"
    no_oracle = [n for n in _TIER1_FIXED if n not in ORACLES]
    assert not no_oracle, f"_TIER1_FIXED names without oracles: {no_oracle}"


def test_driver_green_names_all_registered():
    from review_engine_spark.plans import QUERIES, _DRIVER_GREEN

    missing = [n for n in _DRIVER_GREEN if n not in QUERIES]
    assert not missing, f"_DRIVER_GREEN names not in QUERIES: {missing}"


def test_first_50_oracle_slots_prioritize_unproven():
    """Every not-yet-driver-green oracle query must sit inside the
    50-slot window (while unproven queries still fit, none may be
    displaced by proven-green re-checks)."""
    from review_engine_spark.plans import ORACLES, _DRIVER_GREEN

    names = list(ORACLES)
    window = set(names[:50])
    unproven = [n for n in names if n not in set(_DRIVER_GREEN)]
    if len(unproven) <= 50:
        out = [n for n in unproven if n not in window]
        assert not out, f"unproven oracle queries outside the 50-slot window: {out}"
