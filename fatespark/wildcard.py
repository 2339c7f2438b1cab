"""Wildcard / infix term search via a trigram-banded dictionary.

The reference's suffix-array engine matches token *prefixes* for free
(every indexed position is a token start — ``lib/suffix_array_reader.rb``),
which fatespark covers with the range-pruned ``expand_prefix``. Infix and
general wildcard patterns (``*data*``, ``mi*le``) have no such sort-order
shortcut: the classic scale answer (Lucene wildcard-over-n-grams, Russ
Cox's trigram index) is to band the term dictionary by character
trigrams, intersect the posting-lists-of-trigrams for the pattern's
literal runs, and exact-verify the survivors. That is what this module
does, entirely with DataFrame ops:

- ``dictionary_trigrams``: (trigram, term) — trigrams of ``^term$``
  (anchors make leading/trailing runs selective), a JVM
  transform/explode projection over the terms table. Persist it bucketed
  by ``trigram`` for a served system; inline it is one narrow map.
- ``expand_wildcard``: required trigrams from the pattern's literal runs
  -> IN-list filter on the trigram table -> group HAVING count(DISTINCT
  trigram) = n_required (a term must contain ALL of them) -> exact
  anchored-regex verify -> ascending-term cap. Patterns too short to yield any
  trigram (e.g. ``*a*``) fall back to a full-dictionary verify scan —
  correct, documented as the expensive path (the dictionary is still
  vocab-sized, never corpus-sized).
- ``search_wildcard``: expansion -> the ordinary OR-BM25 ``search`` (same
  semantics as ``search_prefix``: each matched dictionary term scores
  independently).

Pattern language: ``*`` matches any run (including empty); everything
else is literal. Patterns are ASCII-folded like any query term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ascii_fold

__all__ = ["pattern_trigrams", "pattern_regex", "dictionary_trigrams",
           "expand_wildcard", "search_wildcard"]

_ANCHOR_L, _ANCHOR_R = "^", "$"

# trigrams of '^'||term||'$' — JVM higher-order functions only
_TRIGRAMS_EXPR = (
    "transform(sequence(1, length({a}) - 2), i -> substring({a}, i, 3))"
)


def _augmented(term: str) -> str:
    return _ANCHOR_L + term + _ANCHOR_R


def pattern_trigrams(pattern: str) -> list[str]:
    """Required trigrams of the pattern's literal runs, anchored at the
    pattern edges. Any term matching the pattern contains every one of
    these trigrams of its augmented form — the banding invariant."""
    aug = _augmented(pattern)
    out: list[str] = []
    for run in aug.split("*"):
        for i in range(len(run) - 2):
            g = run[i:i + 3]
            if g not in out:
                out.append(g)
    return out


def _re_escape(lit: str) -> str:
    # escape every non-alphanumeric char — legal and identical in Java
    # regex (Spark) and RE2 (DuckDB), unlike Python's re.escape output
    # fed to other engines
    return "".join(c if c.isalnum() else "\\" + c for c in lit)


def pattern_regex(pattern: str) -> str:
    """The exact-verify predicate as an anchored regex: ``*`` -> ``.*``,
    literal runs escaped engine-portably."""
    return ("^" + ".*".join(_re_escape(seg) for seg in pattern.split("*"))
            + "$")


def dictionary_trigrams(terms_df: DataFrame) -> DataFrame:
    """(trigram, term) over distinct dictionary terms."""
    t = terms_df.select("term").distinct()
    aug = "concat('^', term, '$')"
    return t.select(
        "term",
        F.explode(F.expr(_TRIGRAMS_EXPR.format(a=aug))).alias("trigram"))


def expand_wildcard(index, pattern: str, max_terms: int | None = 256,
                    trigrams: DataFrame | None = None) -> list[str]:
    """Dictionary terms matching ``pattern`` (ascending, capped at
    ``max_terms`` like ``expand_prefix``). ``trigrams``: a pre-persisted
    ``dictionary_trigrams`` table to probe instead of recomputing."""
    p = ascii_fold(pattern)
    rx = pattern_regex(p)
    grams = pattern_trigrams(p)
    if grams:
        tg = trigrams if trigrams is not None else \
            dictionary_trigrams(index.terms)
        cand = (tg.filter(F.col("trigram").isin(grams))
                .groupBy("term")
                .agg(F.countDistinct("trigram").alias("ng"))
                .filter(F.col("ng") == len(grams))
                .select("term"))
    else:
        # pattern has no 3-char literal run: full dictionary verify scan
        cand = index.terms.select("term").distinct()
    hits = cand.filter(F.col("term").rlike(rx))
    if max_terms is not None:
        hits = hits.orderBy("term").limit(max_terms)
    return sorted(r["term"] for r in hits.collect())


def search_wildcard(index, pattern: str, k: int = 10,
                    max_terms: int | None = 256,
                    with_url: bool = False, quantize: int | None = None,
                    trigrams: DataFrame | None = None) -> DataFrame:
    """Wildcard query -> trigram-banded dictionary expansion -> OR-BM25."""
    terms = expand_wildcard(index, pattern, max_terms, trigrams)
    if not terms:
        return index._empty()
    return index.search(terms, k=k, mode="OR", with_url=with_url,
                        quantize=quantize)
