"""Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3), 1980) — the stemming step the target pipeline applies after
tokenization + ASCII fold (north rule: "tokenization and stemming of
extracted page text").

Pure python on a single lowercase token, plus a batch wrapper that stems
only the UNIQUE terms of an Arrow batch (``np.unique`` + inverse mapping):
token streams are Zipf-distributed, so the per-batch unique vocabulary is a
small fraction of the token count and the python-level work stays sublinear
in tokens — the same trick that keeps the segment builder's factorize cheap.

The reference has no stemmer (fates tokenizes raw suffixes); this module is
target-new per BASELINE.json's north_star. Non-ASCII and non-alphabetic
tokens pass through unchanged (stemming English suffixes only, matching the
paper's scope)."""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

_VOWELS = frozenset("aeiou")


def _cv(w: str) -> str:
    """consonant/vowel form: 'y' is a consonant at position 0 or after a
    vowel, a vowel after a consonant (paper §2)."""
    out = []
    for i, ch in enumerate(w):
        if ch in _VOWELS:
            out.append("v")
        elif ch == "y":
            out.append("v" if i > 0 and out[i - 1] == "c" else "c")
        else:
            out.append("c")
    return "".join(out)


def _m(stem: str) -> int:
    """measure: number of VC sequences in the collapsed cv-form."""
    prev = "c"
    pairs = 0
    for ch in _cv(stem):
        if prev == "v" and ch == "c":
            pairs += 1
        prev = ch
    return pairs


def _has_vowel(stem: str) -> bool:
    return "v" in _cv(stem)


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cv(w)[-1] == "c"


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y (paper step 1b)."""
    if len(w) < 3:
        return False
    cv = _cv(w)
    return cv[-3:] == "cvc" and w[-1] not in "wxy"


def _ends_replace(w: str, suffix: str, repl: str, min_m: int) -> str | None:
    if w.endswith(suffix):
        stem = w[: len(w) - len(suffix)]
        if _m(stem) > min_m:
            return stem + repl
    return None


# (suffix, replacement) rule tables; condition is m(stem) > 0 for steps 2-3
_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
          ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
          ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
          ("biliti", "ble")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
          "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
          "ize"]


@lru_cache(maxsize=1 << 18)
def porter_stem(w: str) -> str:
    if len(w) <= 2 or not w.isascii() or not w.isalpha():
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    fired = False
    if w.endswith("eed"):
        if _m(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _m(w) == 1 and _cvc(w):
            w = w + "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, repl in _STEP2:
        if w.endswith(suf):
            out = _ends_replace(w, suf, repl, 0)
            if out is not None:
                w = out
            break

    # step 3
    for suf, repl in _STEP3:
        if w.endswith(suf):
            out = _ends_replace(w, suf, repl, 0)
            if out is not None:
                w = out
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _m(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    break
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _m(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _m(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def stem_array(terms: np.ndarray) -> np.ndarray:
    """Stem an object-dtype array of tokens via its unique values — the
    batch-vectorized path used inside pandas UDFs."""
    uniq, inv = np.unique(terms, return_inverse=True)
    stemmed = np.array([porter_stem(t) for t in uniq], dtype=object)
    return stemmed[inv]


def stem_series(s: pd.Series) -> pd.Series:
    return pd.Series(stem_array(s.to_numpy(dtype=object)), index=s.index)
