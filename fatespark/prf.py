"""Pseudo-relevance-feedback query expansion — Bo1 (Amati's Bose-Einstein
divergence-from-randomness model, Terrier's default): run the query, treat
the top ``fb_docs`` results as pseudo-relevant, weight every term they
contain by how much its feedback-set frequency diverges from its
collection-wide expectation, add the ``fb_terms`` most informative terms
to the query with proportional boosts, and search again.

    lambda(t) = cf(t) / N                      (collection expectation)
    w(t)      = tfx(t) * ln((1 + lambda) / lambda) + ln(1 + lambda)

where ``tfx`` is t's total occurrences in the feedback set. The boost of
an expanded query term is the Terrier qtw rule with qtf == 1 (distinct
original terms):

    boost(t) = [t in original] * 1.0 + beta * (w(t) / max_w)

Base-e logs where Terrier uses base-2: both Bo1 addends scale by the
same 1/ln 2, so w(t)/max_w — the only way w enters a boost — is
IDENTICAL; natural log is what the engine/oracle pair already proves
bit-equal cross-engine (``oracle.idf``).

Scale shape: stage 1 is an ordinary top-k search (ids are a k-bounded
collect); ``tfx`` comes from re-analyzing the ``fb_docs`` source rows
(doc-id predicate pushed to the scan — the term_vectors precedent);
collection stats are one partition-pruned IN-list over the tiny terms
table; stage 2 is an ordinary boosted search. Nothing grows with corpus
size except the two searches themselves.

Reference analogue: none (fates has no relevance feedback,
``lib/query.rb``); target-new per the survey's query-surface mandate.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame, functions as F

from .analysis import analyze
from .query import _fold_terms

__all__ = ["bo1_weights", "bo1_expand", "prf_search"]


def bo1_weights(index, corpus: DataFrame, query, *, fb_docs: int = 10,
                id_col: str = "doc_id", text_col: str = "text") -> dict:
    """term -> Bo1 weight over the query's top-``fb_docs`` feedback set
    (empty when the query matches nothing)."""
    qterms = _fold_terms(query, index.analyzer)
    ids = [int(r["doc_id"]) for r in
           index.search(qterms, k=fb_docs, mode="OR")
           .select("doc_id").collect()]
    if not ids:
        return {}
    tfx: Counter = Counter()
    for r in corpus.filter(F.col(id_col).isin(ids)) \
                   .select(F.col(text_col).alias("t")).collect():
        tfx.update(analyze(r["t"] or "", index.analyzer))
    if not tfx:
        return {}
    stats = index.term_stats(sorted(tfx))
    n = index.n_docs
    out = {}
    for t, by_field in stats.items():
        cf = sum(v["cf"] for v in by_field.values())
        lam = cf / n
        out[t] = (float(tfx[t]) * math.log((1.0 + lam) / lam)
                  + math.log(1.0 + lam))
    return out


def bo1_expand(index, corpus: DataFrame, query, *, fb_docs: int = 10,
               fb_terms: int = 10, beta: float = 0.4,
               id_col: str = "doc_id",
               text_col: str = "text") -> tuple[list[str], dict]:
    """(expanded term list, boosts) — original terms keep weight 1.0 and
    gain ``beta * w/max_w`` when they are also informative; expansion
    terms enter at ``beta * w/max_w``. Ties in w break by ascending
    term. Falls back to the plain query when feedback is empty."""
    qterms = _fold_terms(query, index.analyzer)
    w = bo1_weights(index, corpus, qterms, fb_docs=fb_docs,
                    id_col=id_col, text_col=text_col)
    if not w:
        return qterms, {}
    sel = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    wmax = max(v for _, v in sel)
    boosts = {}
    for t, v in sel:
        boosts[t] = (1.0 if t in qterms else 0.0) + beta * (v / wmax)
    terms = sorted(set(qterms) | {t for t, _ in sel})
    for t in qterms:
        boosts.setdefault(t, 1.0)
    return terms, boosts


def prf_search(index, corpus: DataFrame, query, *, k: int = 10,
               fb_docs: int = 10, fb_terms: int = 10, beta: float = 0.4,
               id_col: str = "doc_id", text_col: str = "text",
               quantize: int | None = None) -> DataFrame:
    """Two-stage Bo1 search: expand, then ordinary boosted disjunctive
    BM25 over the expanded term set."""
    terms, boosts = bo1_expand(index, corpus, query, fb_docs=fb_docs,
                               fb_terms=fb_terms, beta=beta,
                               id_col=id_col, text_col=text_col)
    return index.search(terms, k=k, mode="OR",
                        boosts=boosts or None, quantize=quantize)
