"""CommonTermsQuery (Lucene): stopword handling without a stopword list.

Query terms are split by DOCUMENT FREQUENCY at query time: terms whose
df exceeds ``max_doc_freq`` x n_docs are "common" (high-frequency) and
only CONTRIBUTE score; the rest are "rare" (low-frequency) and are
REQUIRED — a doc must contain every rare term to be returned at all.
This keeps head terms ("the") from exploding the candidate set the way
a plain OR does, without maintaining a stopword list and without
losing their scoring signal the way stopword REMOVAL does.

Qualifying docs score the full disjunctive BM25 sum over ALL terms
(``wand.score_or_must`` folds in the exhaustive kernel's ascending
order — bit-identical to plain OR for those docs). Degenerate splits
are exact special cases, not separate code paths: every term rare =
conjunction (the AND doc set with OR's fold), every term common =
plain OR (Lucene's fallback when no required clause exists).

100 TB shape: the df split is one partition-pruned terms-table lookup;
the search is the ordinary single-postings-scan top-k, and the must
mask shrinks per-bucket candidate unions to the rare terms'
intersection — the same reason Lucene built it: the head term's
posting list stops defining the candidate set.

Reference analogue: none (fates has no df-aware query rewriting,
``lib/query.rb``); target-new per the survey's query-surface mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .query import _fold_terms

__all__ = ["split_by_df", "common_terms_search"]


def split_by_df(index, query, max_doc_freq: float = 0.01
                ) -> tuple[list[str], list[str]]:
    """(rare, common) analyzed query terms — rare means
    df <= max_doc_freq * n_docs (df summed across fields; terms absent
    from the dictionary count as rare: df 0). Order follows the folded
    query, deduplicated."""
    if not 0.0 < max_doc_freq <= 1.0:
        raise ValueError(f"max_doc_freq must be in (0, 1], got "
                         f"{max_doc_freq}")
    qterms = list(dict.fromkeys(_fold_terms(query, index.analyzer)))
    stats = index.term_stats(qterms)
    cut = max_doc_freq * index.n_docs
    rare, common = [], []
    for t in qterms:
        df = sum(v["df"] for v in stats.get(t, {}).values())
        (rare if df <= cut else common).append(t)
    return rare, common


def common_terms_search(index, query, *, k: int = 10,
                        max_doc_freq: float = 0.01,
                        quantize: int | None = None,
                        boosts: dict | None = None) -> DataFrame:
    """Top-``k`` CommonTermsQuery: rare terms MUST match, common terms
    SHOULD; all terms score. Returns (doc_id, score) in the standard
    (score DESC, doc_id ASC) total order."""
    rare, common = split_by_df(index, query, max_doc_freq)
    return index.search(rare + common, k=k, mode="OR",
                        must_terms=rare or None, boosts=boosts,
                        quantize=quantize)
