"""More-like-this: related-document search seeded by a document.

The classic MLT contract (Lucene ``MoreLikeThis``): take the seed
document's term vector, keep the ``m`` most characteristic terms by
tf x idf, and run them as a disjunctive BM25 query, excluding the seed
itself. The reference has no document-similarity surface at all (fates
only matches literal query suffixes); this composes fatespark's existing
pieces — one seed-doc fetch, one partition-pruned term-dictionary lookup,
one ordinary ``search()`` — into the feature.

Scale shape: the seed fetch reads ONE row (doc-id predicate pushed to the
parquet/Iceberg scan); the df lookup is an IN-list over the tiny terms
table bounded by the seed's unique-term count (hundreds); the query that
does the real work is the same single-postings-scan top-k as any other
search. Nothing here grows with corpus size except the final search.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import analyze
from .oracle import idf as idf_fn

__all__ = ["seed_terms", "more_like_this"]


def seed_terms(index, text: str, m: int = 5) -> list[str]:
    """The ``m`` most characteristic terms of ``text`` against ``index``'s
    corpus statistics: weight = tf(term in text) * idf(corpus df), ties
    broken by ascending term. Terms absent from the dictionary (never
    indexed, or fully deleted) are skipped. ``df`` is summed across fields
    on multi-field indexes (a term characterizes the doc regardless of
    which field it appears in)."""
    tf = Counter(analyze(text, index.analyzer))
    if not tf:
        return []
    stats = index.term_stats(sorted(tf))
    weighted = [
        (float(tf[t]) * idf_fn(index.n_docs,
                               sum(v["df"] for v in by_field.values())), t)
        for t, by_field in stats.items()
    ]
    weighted.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in weighted[:m]]


def more_like_this(index, corpus: DataFrame, doc_id: int, *, k: int = 10,
                   m: int = 5, id_col: str = "doc_id",
                   text_col: str = "text",
                   quantize: int | None = None) -> DataFrame:
    """Top-``k`` documents most similar to ``doc_id``: disjunctive BM25
    over the seed's top-``m`` tf-idf terms, seed excluded. Returns
    (doc_id, score) in (score DESC, doc_id ASC) order.

    Exact: the inner search retrieves ``k + 1`` so dropping the seed (at
    most one row) still leaves a full, correctly-ranked top-``k``.
    """
    row = (corpus.filter(F.col(id_col) == doc_id)
           .select(F.col(text_col).alias("t")).first())
    if row is None or row["t"] is None:
        return index._empty()
    terms = seed_terms(index, row["t"], m)
    if not terms:
        return index._empty()
    res = index.search(terms, k=k + 1, mode="OR", quantize=quantize)
    return (res.filter(F.col("doc_id") != doc_id)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))
