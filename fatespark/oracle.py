"""Single-node pure-Python oracle for the engine's query semantics.

This is the executable spec: the Spark engine must match it rank-identically
(same top-k doc ids AND same float64 BM25 scores, total order
``(score DESC, doc_id ASC)``). Mirrors the reference's count/find/top-k query
surface (``lib/fates.rb:48-84``) with the weighted ranking upgraded to BM25
per the north rule.

BM25 spec (fixed engine-wide; FIXTURES.md F5):
    k1 = 1.2, b = 0.75
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))        # Robertson/Lucene
    score(t, d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    avgdl       = mean doc length over ALL docs (0-length docs included)
All arithmetic in float64.
"""

from __future__ import annotations

import math
from collections import Counter

from .analysis import ANALYZERS, ascii_fold

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf: float, dl: float, avgdl: float, idf_val: float) -> float:
    # parenthesization is part of the spec: idf * (tf-part), so the engine's
    # vectorized (idf * bm25_part) matches bit-for-bit in float64
    norm = (1.0 - B) + (B * dl / avgdl if avgdl > 0 else 0.0)
    return idf_val * (tf * (K1 + 1.0) / (tf + K1 * norm))


class BM25Oracle:
    """In-memory inverted index + BM25 over (doc_id, text) pairs."""

    def __init__(self, docs: list[tuple[int, str]], analyzer: str = "whitespace"):
        tok, _ = ANALYZERS[analyzer]
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.doclen: dict[int, int] = {}
        for doc_id, text in docs:
            terms = [ascii_fold(t) for t in tok(text)]
            self.doclen[doc_id] = len(terms)
            for pos, t in enumerate(terms):
                self.postings.setdefault(t, {}).setdefault(doc_id, []).append(pos)
        self.n_docs = len(self.doclen)
        self.avgdl = (sum(self.doclen.values()) / self.n_docs) if self.n_docs else 0.0

    def count(self, term: str) -> int:
        """Doc frequency of a term (hit-count analogue of the reference's
        ``count_hits``, ``lib/suffix_array_reader.rb:115-125``)."""
        return len(self.postings.get(ascii_fold(term), {}))

    def _candidates(self, terms: list[str], mode: str) -> set[int]:
        plists = [set(self.postings.get(t, {})) for t in terms]
        if not plists:
            return set()
        if mode == "AND":
            out = plists[0]
            for p in plists[1:]:
                out = out & p
            return out
        out = set()
        for p in plists:
            out |= p
        return out

    def search(self, query: str | list[str], k: int = 10, mode: str = "AND",
               offset: int = 0) -> list[tuple[int, float]]:
        """Top-k ``(doc_id, score)`` with pagination, mirroring
        ``fulltext_find(query, offset, limit)`` (``lib/fates.rb:53-84``)."""
        raw = query.split() if isinstance(query, str) else list(query)
        terms = sorted({ascii_fold(t) for t in raw if t})
        cands = self._candidates(terms, mode)
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            iv = idf(self.n_docs, len(plist))
            for doc_id, poss in plist.items():
                if doc_id in cands:
                    scores[doc_id] = scores.get(doc_id, 0.0) + bm25_term_score(
                        len(poss), self.doclen[doc_id], self.avgdl, iv)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[offset:offset + k]

    def search_phrase(self, phrase: str, k: int = 10, offset: int = 0) -> list[tuple[int, float]]:
        """Consecutive-token phrase match (fates' natural phrase semantics,
        ``README.markdown:9-11``), scored as one pseudo-term whose tf is the
        per-doc phrase occurrence count."""
        terms = [ascii_fold(t) for t in phrase.split() if t]
        if not terms:
            return []
        first = self.postings.get(terms[0], {})
        occ: dict[int, int] = {}
        for doc_id, poss in first.items():
            cnt = 0
            for p in poss:
                if all((doc_id in self.postings.get(terms[i], {}))
                       and (p + i in self.postings[terms[i]][doc_id])
                       for i in range(1, len(terms))):
                    cnt += 1
            if cnt:
                occ[doc_id] = cnt
        df = len(occ)
        iv = idf(self.n_docs, df)
        ranked = sorted(
            ((d, bm25_term_score(tf, self.doclen[d], self.avgdl, iv)) for d, tf in occ.items()),
            key=lambda kv: (-kv[1], kv[0]))
        return ranked[offset:offset + k]

    def expand_prefix(self, prefix: str) -> list[str]:
        p = ascii_fold(prefix)
        return sorted(t for t in self.postings if t.startswith(p))

    def search_prefix(self, prefix: str, k: int = 10) -> list[tuple[int, float]]:
        """Prefix query (``fa%`` — ``README.markdown:7-9``): dictionary
        expansion then disjunctive BM25 over the expanded terms."""
        return self.search(self.expand_prefix(prefix), k=k, mode="OR")

    def term_doc_tfs(self, term: str) -> Counter:
        return Counter({d: len(p) for d, p in self.postings.get(ascii_fold(term), {}).items()})
