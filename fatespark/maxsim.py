"""Multi-vector late-interaction retrieval — the ColBERT MaxSim operator
(Khattab & Zaharia, SIGIR 2020).

Late interaction stores PER-TOKEN vectors for each document and scores

    maxsim(q, d) = sum over query tokens t of  max over doc tokens u of
                   <q_t, d_u>

— the dominant long-document retrieval scorer between brute
single-vector search and cross-encoders (ColBERT/PLAID serve it at
billion-token scale).

Exactness: every vector quantizes to ``floor(v * 4096)`` int codes (the
MMR/embdup precedent), so token dots are int64 sums (|code| <= 2^12+,
dim-bounded: dim * 2^24 << 2^53 — order-independent EXACT integers),
the per-query-token max and the final sum are integer ops, and the
(score DESC, id ASC) order is total — hash-exact cross-engine with no
float-fold machinery anywhere.

Spark shape: scoring is ONE narrow whole-stage-codegen projection
(nested higher-order expressions over the token-vector array; query
tokens ride as literal int arrays) into a k-bounded
TakeOrderedAndProject — zero Python, zero shuffles before the bounded
top-k.  At 10^12 docs the scan is the cost; PLAID-style candidate
pruning composes in front the same way IVF cells do for single vectors.

The multi-vector fixture for the driver row splits the corpus 64-dim
embedding into 4 x 16-dim token vectors (documented synthesis — the
testdata has no native multi-vector column); the operator itself takes
any ``array<array<float>>`` column.

Reference analogue: none (fates is text-only) — target-new.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

Q = 4096.0   # quantization scale (the MMR precedent)

__all__ = ["split_multivector", "maxsim_topk", "quantize_tokens",
           "maxsim_topk_sql"]


def split_multivector(vec_col, n_tokens: int, dim: int):
    """array<array<float>> column: the flat ``dim*n_tokens`` vector cut
    into ``n_tokens`` contiguous token vectors (the driver-row fixture;
    real multi-vector data arrives already nested)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.array(*[F.slice(c, i * dim + 1, dim)
                     for i in range(n_tokens)])


def quantize_tokens(query_tokens) -> list[list[int]]:
    """Driver-side twin of the engine's token quantization."""
    return [[math.floor(float(x) * Q) for x in t] for t in query_tokens]


def _tok_codes(tokens_col):
    return F.transform(
        tokens_col,
        lambda t: F.transform(
            t, lambda x: F.floor(x.cast("double") * F.lit(Q)).cast("long")))


def maxsim_topk(df: DataFrame, query_tokens, k: int = 10, *,
                id_col: str = "vec_id", tokens_col=None) -> DataFrame:
    """(id, score): top-k by integer-exact MaxSim.  ``tokens_col`` is an
    array<array<float>> column (or expression); ``query_tokens`` a list
    of float vectors."""
    if not query_tokens:
        raise ValueError("maxsim needs >= 1 query token")
    qcodes = quantize_tokens(query_tokens)
    dim = len(qcodes[0])
    if any(len(t) != dim for t in qcodes):
        raise ValueError("query token dims differ")
    codes = _tok_codes(tokens_col)
    score = None
    for qt in qcodes:
        qarr = F.array(*[F.lit(int(v)) for v in qt])
        best = F.array_max(F.transform(
            codes,
            lambda d: F.aggregate(F.zip_with(d, qarr, lambda a, b: a * b),
                                  F.lit(0).cast("long"),
                                  lambda acc, x: acc + x)))
        score = best if score is None else score + best
    return (df.select(F.col(id_col), score.alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))


def maxsim_topk_sql(src: str, query_tokens, k: int = 10, *,
                    n_tokens: int = 4, dim: int = 16,
                    query_id: int = 0) -> str:
    """DuckDB twin over the flat-embedding fixture: same split, same
    quantization, same int64 dots, same max/sum — hash-exact.  The
    query tokens come from row ``query_id``'s embedding, split and
    quantized IN SQL (so the fixture synthesis itself is checked)."""
    doc_toks = ", ".join(
        "list_transform(embedding[{a}:{b}], "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 4096.0) AS BIGINT))"
        .format(a=i * dim + 1, b=(i + 1) * dim)
        for i in range(n_tokens))
    q_toks = ", ".join(
        "list_transform(qe[{a}:{b}], "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 4096.0) AS BIGINT))"
        .format(a=i * dim + 1, b=(i + 1) * dim)
        for i in range(n_tokens))
    arms = []
    for qi in range(len(query_tokens)):
        arms.append(
            f"list_max(list_transform(dts, dt -> "
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"j -> dt[j] * qts[{qi + 1}][j]))))")
    total = " + ".join(f"({a})" for a in arms)
    return f"""
WITH q AS (
  SELECT embedding AS qe FROM {src} WHERE vec_id = {query_id}
),
qt AS (SELECT [{q_toks}] AS qts FROM q),
c AS (
  SELECT vec_id, [{doc_toks}] AS dts
  FROM {src} WHERE vec_id <> {query_id}
)
SELECT vec_id, ({total})::BIGINT AS score
FROM c, qt
ORDER BY score DESC, vec_id ASC
LIMIT {k}"""
