"""Porter stemmer (SURVEY §2.H H13; reference ``rank.py:132-141``).

The reference constructs an NLTK ``PorterStemmer`` and wraps it with a
3-char guard: ``stem(word)`` lowercases, stems, and returns the
lowercased *original* when the stem comes out shorter than 3 chars
(``rank.py:139-140``). It is dead code in the reference (nothing calls
it — the tokenize path uses spaCy lemmas instead), implemented here to
close the §2 inventory.

This is the original Porter (1980) algorithm from the published paper —
"An algorithm for suffix stripping", M.F. Porter, Program 14(3) — not
NLTK's extended mode (which adds an irregular-forms table and tweaks
step 1b/1c; e.g. original stems "ties"→"ti" where NLTK-extended gives
"tie"). The reference's guard makes the two agree on short stems anyway:
"ti" < 3 chars → the guard returns "ties" verbatim.

Python-side stemming is the slow path by design: the stemmer is exposed
as an Arrow-batched ``pandas_udf`` (never row-at-a-time) and kept off
the oracle roster (no SQL-expressible equivalent) — apply it after
filters/limits have cut the data, like the multimodal decode operators.
"""

from __future__ import annotations

__all__ = ["porter_stem", "stem_with_guard", "stem_tokens_udf"]

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the paper: number of VC sequences in C?(VC){m}V? form."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o: ends cons-vowel-cons where the final cons is not w, x, or y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    if w.endswith("eed"):
        return w[:-1] if _measure(w[:-3]) > 0 else w
    fired = None
    if w.endswith("ed") and _has_vowel(w[:-2]):
        fired = w[:-2]
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        fired = w[:-3]
    if fired is None:
        return w
    w = fired
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if _ends_double_cons(w) and w[-1] not in "lsz":
        return w[:-1]
    if _measure(w) == 1 and _cvc(w):
        return w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _map_suffix(w: str, table, min_m: int) -> str:
    for suf, repl in table:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > min_m - 1:
                return stem + repl
            return w
    return w


def _step4(w: str) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and stem and stem[-1] not in "st":
                    return w
                return stem
            return w
    return w


def _step5(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    if _ends_double_cons(w) and w[-1] == "l" and _measure(w[:-1]) > 1:
        w = w[:-1]
    return w


def porter_stem(word: str) -> str:
    """The plain 1980 algorithm (words shorter than 3 chars unchanged,
    per the paper's note that short words gain nothing from stemming)."""
    w = word.lower()
    if len(w) < 3:
        return w
    w = _step1a(w)
    w = _step1b(w)
    w = _step1c(w)
    w = _map_suffix(w, _STEP2, 1)
    w = _map_suffix(w, _STEP3, 1)
    w = _step4(w)
    w = _step5(w)
    return w


def stem_with_guard(word: str) -> str:
    """The reference wrapper (rank.py:136-141): lowercase, stem, and fall
    back to the lowercased original when the stem drops under 3 chars."""
    lw = word.lower()
    stemmed = porter_stem(lw)
    if len(stemmed) < 3:
        return lw
    return stemmed


def stem_tokens_udf():
    """array<string> → array<string> Arrow-batched stemmer (pandas_udf,
    never row-at-a-time): the Spark-side wrapper for stemming a token
    column produced by ``functions.text.tokenize``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _stem(tokens):
        return tokens.map(
            lambda toks: None
            if toks is None
            else [stem_with_guard(t) for t in toks]
        )

    # real class objects (the module's `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf cannot resolve)
    _stem.__annotations__ = {"tokens": pd.Series, "return": pd.Series}
    return pandas_udf(_stem, "array<string>")
