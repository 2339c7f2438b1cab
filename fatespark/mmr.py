"""Maximal Marginal Relevance result diversification (Carbonell &
Goldstein, SIGIR 1998): greedily re-rank a retrieval pool so each pick
balances relevance against redundancy with what is already picked,

    MMR(d) = lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s)

Engine-exact determinism is built from integers, the repo's two proven
primitives for cross-engine float math:

- rel(d) = 1 / (rrf_k + rank(d)) over the pool's INTEGER relevance
  ranks (the hybrid-RRF precedent, Cormack et al. 2009) — no raw BM25
  floats cross the contract;
- sim(a, b) = cosine over embeddings QUANTIZED to q_i = floor(v_i *
  4096) (the IVF-exactness precedent): every pairwise product is an
  integer <= 2^24 and a 64-dim sum stays < 2^53, so the dot product is
  EXACT in float64 regardless of summation order — no ordered-fold
  machinery needed; the only roundings are one sqrt per norm and one
  division, both single correctly-rounded IEEE ops.

A doc without an embedding is treated as maximally novel (sim 0 against
everything) — unknown content should not be penalized as redundant.

Scale shape: the greedy loop runs on the driver over the POOL (tens of
rows — the rescore-window precedent); the pool fetch is an ordinary
top-k search and one pushed-down IN-list read of the embedding table.
Nothing is corpus-scale. Reference analogue: none (fates returns raw
rank order, ``lib/query.rb``); target-new per the survey's
serving-surface mandate.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

__all__ = ["mmr_select", "mmr_rerank"]

QUANT = 4096.0


def mmr_select(ranks: dict[int, int], vecs: dict[int, np.ndarray],
               k: int, lam: float = 0.7, rrf_k: int = 60) -> list[int]:
    """Greedy MMR over a pool: ``ranks`` maps doc_id -> 1-based relevance
    rank, ``vecs`` maps doc_id -> quantized int64 vector (missing = zero
    similarity). Returns the picked doc_ids in MMR order. Ties break by
    ascending doc_id; the first pick is always rank 1 (an empty selected
    set imposes no penalty)."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    pool = sorted(ranks)
    norms = {d: math.sqrt(float(np.dot(v, v)))
             for d, v in vecs.items()}

    def sim(a: int, b: int) -> float:
        va, vb = vecs.get(a), vecs.get(b)
        if va is None or vb is None:
            return 0.0
        na, nb = norms[a], norms[b]
        if na == 0.0 or nb == 0.0:
            return 0.0
        return float(np.dot(va, vb)) / (na * nb)

    picked: list[int] = []
    remaining = set(pool)
    while remaining and len(picked) < k:
        best = None
        for d in sorted(remaining):
            rel = 1.0 / (rrf_k + ranks[d])
            pen = max((sim(d, s) for s in picked), default=0.0)
            score = lam * rel - (1.0 - lam) * pen
            if best is None or score > best[0]:
                best = (score, d)
        picked.append(best[1])
        remaining.discard(best[1])
    return picked


def mmr_rerank(index, emb_df: DataFrame, query, *, k: int = 10,
               pool: int = 20, lam: float = 0.7, rrf_k: int = 60,
               mode: str = "OR", quantize: int | None = None,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Diversified top-``k``: retrieve a ``pool``-sized candidate list,
    fetch its embeddings (id IN-list pushdown), greedily MMR-select.
    Returns (doc_id, rel_rank, mmr_rank) — integers only."""
    res = index.search(query, k=pool, mode=mode,
                       quantize=quantize).collect()
    ranks = {int(r["doc_id"]): i + 1 for i, r in enumerate(res)}
    if not ranks:
        return index.spark.createDataFrame(
            [], "doc_id long, rel_rank int, mmr_rank int")
    rows = (emb_df.filter(F.col(id_col).isin(list(ranks)))
            .select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
            .collect())
    vecs = {int(r["i"]): np.floor(
        np.asarray(r["v"], dtype=np.float64) * QUANT).astype(np.int64)
        for r in rows if r["v"] is not None}
    picked = mmr_select(ranks, vecs, k, lam=lam, rrf_k=rrf_k)
    out = [(d, ranks[d], i + 1) for i, d in enumerate(picked)]
    return index.spark.createDataFrame(
        out, "doc_id long, rel_rank int, mmr_rank int")
