"""Text kernels (SURVEY §2.H, H1-H14).

Reproduces the reference's text-cleaning chain (``embed.py:13-51``),
budget-parsing cascade (``rank.py:57-129``), and LLM-output extraction
(``summarize.py:13-25``) as Catalyst expressions. Regex patterns are kept
dialect-portable (no lookaround/backrefs) so the same pattern runs under
Java regex (Spark) and RE2 (DuckDB oracle) — verified by the oracle suite.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "unescape_html_entities",
    "clean_text",
    "token_count",
    "tokenize",
    "STOPWORDS",
    "parse_money",
    "parse_budget",
    "extract_summary",
    "scrub_pii",
    "BUDGET_PATTERNS",
    "PII_PATTERNS",
]

# ---------------------------------------------------------------------------
# H1-H7: cleaning chain (embed.py:13-51)
# ---------------------------------------------------------------------------

#: Declared entity subset for oracle-checkable unescaping. The reference
#: uses ``html.unescape`` (full HTML5 entity table, embed.py:31); the
#: engine's deterministic path covers the named entities that occur in
#: review text in practice plus EVERY printable-ASCII numeric character
#: reference — decimal ``&#39;`` and lowercase-hex ``&#x27;`` forms,
#: semicolon-terminated (html.unescape also accepts unterminated refs and
#: uppercase hex digits; those stay out of the declared subset).
#:
#: Ordering is load-bearing: every entity that DECODES TO ``&`` is
#: replaced LAST so the chain matches html.unescape's single-pass
#: semantics on inputs like ``&amp;lt;`` or ``&#38;#60;`` (one pass
#: yields ``&lt;`` / ``&#60;``, never ``<``).
_NAMED_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
]


def _printable_numeric_entities() -> list[tuple[str, str]]:
    ents: list[tuple[str, str]] = []
    for code in range(32, 127):
        ch = chr(code)
        if ch == "&":  # decodes to the entity-start char: amp group, last
            continue
        ents.append((f"&#{code};", ch))
        ents.append((f"&#x{code:x};", ch))
    return ents


_NUMERIC_ENTITIES: list[tuple[str, str]] = _printable_numeric_entities()

#: Replaced last (see ordering note above).
_AMP_ENTITIES: list[tuple[str, str]] = [
    ("&#38;", "&"),
    ("&#x26;", "&"),
    ("&amp;", "&"),
]

#: Full declared table (oracle generation walks this in order; the amp
#: group is last by construction).
HTML_ENTITIES: list[tuple[str, str]] = (
    _NAMED_ENTITIES + _NUMERIC_ENTITIES + _AMP_ENTITIES
)


def unescape_html_entities(col: Column) -> Column:
    """H1: unescape the declared HTML-entity subset (embed.py:31).

    The 188-step numeric chain is gated behind a ``contains('&#')`` check
    so rows without numeric refs (the overwhelming majority of a review
    corpus) pay only the 8 named/amp replaces; CASE WHEN short-circuits
    per row in codegen, and the oracle SQL mirrors the same gate.
    """
    out = col
    for entity, repl in _NAMED_ENTITIES:
        out = F.replace(out, F.lit(entity), F.lit(repl))
    numeric = out
    for entity, repl in _NUMERIC_ENTITIES:
        numeric = F.replace(numeric, F.lit(entity), F.lit(repl))
    out = F.when(out.contains("&#"), numeric).otherwise(out)
    for entity, repl in _AMP_ENTITIES:
        out = F.replace(out, F.lit(entity), F.lit(repl))
    return out


def clean_text(col: Column) -> Column:
    """H1-H7: the full cleaning chain, order-faithful to embed.py:13-51.

    unescape → lower → strip URLs → strip tags → strip @/# tokens →
    charset whitelist → whitespace normalize + trim. Null input → null
    (the reference returns "" for non-str; callers coalesce where the
    distinction matters).
    """
    out = unescape_html_entities(col)
    out = F.lower(out)
    out = F.regexp_replace(out, r"http\S+|www\S+", "")  # H3 (embed.py:36-37)
    out = F.regexp_replace(out, r"<.*?>", "")  # H4 (embed.py:39-40)
    out = F.regexp_replace(out, r"[@#]\w+", "")  # H5 (embed.py:42-43)
    out = F.regexp_replace(out, r"""[^a-z0-9\s.,!?;:'"-]""", "")  # H6 (embed.py:45-46)
    out = F.regexp_replace(out, r"\s+", " ")  # H7 (embed.py:48)
    return F.trim(out)


def token_count(col: Column) -> Column:
    """H14/B3 basis: whitespace token count, `len(text.split(' '))`
    semantics (embed.py:61) — split on single space post-normalization.
    Cast to long so the count type is stable across engines.
    """
    return F.size(F.split(col, " ")).cast("long")


#: Small fixed stopword list for the oracle-checkable tokenize subset
#: (H12 is spaCy-based dead code in the reference, rank.py:144-160; the
#: engine keeps the tokenize+stopword-removal core deterministic and
#: leaves lemmatization to the inference surface).
STOPWORDS: list[str] = [
    "a", "an", "the", "and", "or", "but", "if", "then", "is", "are",
    "was", "were", "be", "been", "of", "to", "in", "on", "at", "for",
    "with", "by", "from", "as", "it", "its", "this", "that", "not", "no",
]


def tokenize(col: Column, stopwords: list[str] | None = None) -> Column:
    """H12 (deterministic subset): lowercase whitespace tokens minus
    stopwords and empties. Returns array<string>.
    """
    stops = stopwords if stopwords is not None else STOPWORDS
    toks = F.split(F.lower(col), r"\s+")
    return F.filter(toks, lambda t: (t != "") & ~t.isin(stops))


# ---------------------------------------------------------------------------
# H8-H9: budget parsing cascade (rank.py:57-129)
# ---------------------------------------------------------------------------

#: Money-token grammar shared by all budget patterns (rank.py:58-62):
#: digits with commas/dots, optional whitespace, optional k/kk suffix.
_MONEY = r"(\d[\d,.]*\s*(?:k|kk)?)"

#: The five-pattern cascade, first-match-wins (rank.py:84-129). Group
#: indexes are 1 (and 2 for the range's second bound).
BUDGET_PATTERNS: dict[str, str] = {
    "range": r"(?:between\s+)?\$?" + _MONEY + r"\s*(?:-+|~|to|and)\s*\$?" + _MONEY,
    "upper": r"(?:under|below|less than|at most|≤|&lt;=)\s*\$?" + _MONEY,
    "approx": r"(?:around|about|approx(?:imately)?|near|nearly)\s*\$?" + _MONEY,
    "num_budget": r"\$?" + _MONEY + r"\s*(?:budget|budgets?)",
    "budget_num": r"(?:budget|budgets?)\s*\$?" + _MONEY,
}

#: Strict money literal accepted by parse_money (rank.py:57,71-82).
_MONEY_STRICT = r"^(\d+(\.\d+)?)(k|kk|k\+)?$"


def parse_money(token: Column) -> Column:
    """H9: money-literal parse (rank.py:71-82).

    Strip commas, trim, match ``^(\\d+(\\.\\d+)?)(k|kk|k\\+)?$``; any k
    suffix multiplies by 1000 (`kk` is NOT 10^6 in the reference —
    rank.py:80-81 multiplies once). Invalid literal → NULL, which makes
    the enclosing cascade pattern fall through exactly like the
    reference's ``parse_money(...) is None`` checks.
    """
    cleaned = F.trim(F.replace(token, F.lit(","), F.lit("")))
    num = F.regexp_extract(cleaned, _MONEY_STRICT, 1)
    suffix = F.regexp_extract(cleaned, _MONEY_STRICT, 3)
    value = num.cast("double") * F.when(suffix != "", F.lit(1000.0)).otherwise(F.lit(1.0))
    return F.when(num != "", value)


def parse_budget(query: Column) -> Column:
    """H8: 5-pattern budget-anchor cascade (rank.py:84-129).

    Lowercase, then try range → upper-bound → approx → "N budget" →
    "budget N"; each candidate contributes only if its pattern matched
    AND its money literal(s) parse; range yields the midpoint. No match
    anywhere → NULL (reference returns None).
    """
    q = F.lower(query)

    def candidate(pattern: str, group: int = 1) -> Column:
        tok = F.regexp_extract(q, pattern, group)
        return F.when(tok != "", parse_money(tok))

    lo = candidate(BUDGET_PATTERNS["range"], 1)
    hi = candidate(BUDGET_PATTERNS["range"], 2)
    range_mid = F.when(lo.isNotNull() & hi.isNotNull(), (lo + hi) / 2.0)

    return F.coalesce(
        range_mid,
        candidate(BUDGET_PATTERNS["upper"]),
        candidate(BUDGET_PATTERNS["approx"]),
        candidate(BUDGET_PATTERNS["num_budget"]),
        candidate(BUDGET_PATTERNS["budget_num"]),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (training-data curation surface; no reference analog)
# ---------------------------------------------------------------------------

#: Redaction patterns, applied IN ORDER (SSN before phone — the phone
#: pattern would otherwise consume SSN digit runs). All patterns are
#: lookaround/backref-free so they evaluate identically under Java regex
#: (Spark) and RE2 (DuckDB oracle).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("ssn", r"\d{3}-\d{2}-\d{4}", "[SSN]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "[PHONE]"),
]


def scrub_pii(col: Column) -> tuple[Column, Column]:
    """Redact emails / phone numbers / SSN-shaped tokens before a corpus
    ships to training: returns ``(scrubbed, n_redactions)``. Counts are
    taken per pattern against the text as that pattern sees it (i.e.
    after earlier redactions), matching the sequential replace chain.
    Pure Catalyst — regexp_replace/regexp_count, no Python.
    """
    scrubbed = col
    total = F.lit(0)
    for _name, pat, repl in PII_PATTERNS:
        total = total + F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return scrubbed, total.cast("long")


# ---------------------------------------------------------------------------
# H10-H11: LLM-output extraction (summarize.py:13-25)
# ---------------------------------------------------------------------------


def extract_summary(raw: Column) -> Column:
    """H10+H11: strip outer quotes, take everything after the first
    ``ASSISTANT:`` label (dotall — the reference's greedy ``(.*)`` with
    re.S captures through later labels too), fall back to the whole
    string, then drop trailing ``</s>`` / ``[END]`` / ``[/ASSISTANT]``.
    """
    s = F.trim(raw)
    s = F.regexp_replace(s, r'^"+|"+$', "")  # strip('"') — all outer double quotes
    s = F.regexp_replace(s, r"^'+|'+$", "")  # then strip("'")
    labeled = F.regexp_extract(s, r"(?s)ASSISTANT:\s*(.*)$", 1)
    summary = F.when(s.rlike("ASSISTANT:"), F.trim(labeled)).otherwise(F.trim(s))
    summary = F.regexp_replace(summary, r"(</s>|\[END\]|\[/ASSISTANT\])\s*$", "")
    return F.trim(summary)
