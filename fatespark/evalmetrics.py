"""Ranking-quality evaluation: MRR@k and NDCG@k over a relevance oracle.

The standard IR evaluation loop (Lucene ships it as the ``benchmark``
quality module; TREC's trec_eval is the canonical tool): run each query,
mark which of the top-k hits are relevant, and fold the hit pattern into
reciprocal-rank and discounted-cumulative-gain metrics. Here relevance is
*derived* (a doc is relevant to a query iff it contains ALL the query's
terms — the conjunctive-match qrel, reproducible on any corpus without
human labels), which makes the whole evaluation a deterministic function
of the corpus and therefore oracle-checkable.

Float discipline (cross-engine bit-exactness): every ``1/rank`` and
``1/log2(rank+1)`` gain is precomputed in Python and embedded as a FLOAT
LITERAL in both the Spark plan and the SQL twin — neither engine ever
calls ``log``; DCG is an explicit fixed-order chain of
``gain_i * rel_i`` terms (rel_i in {0,1} pivoted per rank), so no
nondeterministic float SUM order exists anywhere. NDCG divides two such
exact values.

Scale shape: per query, ONE top-k search (k rows broadcast everywhere
after that) plus ONE map-side-combinable corpus agg for the qrel count;
the per-query metric rows are 1-row aggregates unioned together —
nothing corpus-sized is ever shuffled.

Reference analogue: fates ranks and prints the top-10 with deterministic
scores (``README.markdown:74-83``); this is the measurement layer a user
of that ranking needs to tune it.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .build import WS_SPLIT_RE
from .textops import fold_col

# rank -> gain literals, shared verbatim with the SQL twin (sql_gains)
_MAX_K = 100


def rr_gain(rank: int) -> float:
    """Reciprocal-rank gain literal for 1-based ``rank``."""
    return 1.0 / rank


def dcg_gain(rank: int) -> float:
    """Binary-relevance DCG gain literal for 1-based ``rank``."""
    return 1.0 / math.log2(rank + 1.0)


def idcg(n_rel: int, k: int) -> float:
    """Ideal DCG with ``min(n_rel, k)`` relevant docs packed at the top —
    an exact fixed-order partial sum of the same gain literals."""
    total = 0.0
    for r in range(1, min(n_rel, k) + 1):
        total += dcg_gain(r)
    return total


def _contains_all(text_col, terms: list[str]):
    """JVM predicate: the ASCII-folded whitespace tokens of ``text_col``
    contain every term — the derived conjunctive qrel."""
    toks = F.split(fold_col(F.coalesce(text_col, F.lit(""))), WS_SPLIT_RE)
    return reduce(lambda a, b: a & b,
                  (F.array_contains(toks, t) for t in terms))


def ranking_eval(index, docs: DataFrame, queries: dict[str, list[str]],
                 k: int = 10, text_col: str = "text",
                 id_col: str = "doc_id",
                 mode: str = "OR", quantize: int | None = 4) -> DataFrame:
    """(qid, n_rel, mrr, ndcg) for each query, ordered by qid.

    ``queries`` maps qid -> term list. Rankings are ``index.search``
    top-``k`` (``mode``/``quantize`` as given); relevance is the derived
    conjunctive qrel over ``docs``; ``n_rel`` its corpus-wide count.
    """
    if k < 1 or k > _MAX_K:
        raise ValueError(f"k must be in [1, {_MAX_K}]")
    out = None
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    for qid in sorted(queries):
        terms = queries[qid]
        ranked = (index.search(terms, k=k, mode=mode, quantize=quantize)
                  .select("doc_id", "score")
                  .withColumn("rnk", F.row_number().over(w)))
        rel = _contains_all(F.col(text_col), terms)
        j = ranked.join(
            docs.select(F.col(id_col).alias("doc_id"),
                        rel.cast("int").alias("_rel")), "doc_id")
        # per-rank {0,1} pivot -> explicit fixed-order gain chains
        pivots = [F.coalesce(F.max(F.when(F.col("rnk") == i, F.col("_rel"))
                                   .otherwise(0)), F.lit(0)).alias(f"r{i}")
                  for i in range(1, k + 1)]
        agg = j.agg(*pivots)
        dcg_expr = reduce(
            lambda a, b: a + b,
            (F.lit(dcg_gain(i)) * F.col(f"r{i}").cast("double")
             for i in range(1, k + 1)))
        first_rel = F.coalesce(*[
            F.when(F.col(f"r{i}") == 1, F.lit(rr_gain(i)))
            for i in range(1, k + 1)], F.lit(0.0))
        n_rel_df = docs.agg(
            F.sum(rel.cast("long")).alias("n_rel"))
        idcg_expr = F.coalesce(*[
            F.when(F.least(F.col("n_rel"), F.lit(k)) == n,
                   F.lit(idcg(n, k)))
            for n in range(1, k + 1)], F.lit(0.0))
        row = (agg.crossJoin(n_rel_df)
               .select(F.lit(qid).alias("qid"),
                       F.col("n_rel"),
                       first_rel.alias("mrr"),
                       F.when(F.col("n_rel") > 0,
                              dcg_expr / idcg_expr)
                       .otherwise(F.lit(0.0)).alias("ndcg")))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("qid")


def sql_gains(k: int) -> tuple[list[float], list[float], list[float]]:
    """The exact literals the SQL twin must embed: (rr, dcg, idcg) for
    ranks/counts 1..k — ``repr()`` of these round-trips to the identical
    float64 in DuckDB."""
    return ([rr_gain(i) for i in range(1, k + 1)],
            [dcg_gain(i) for i in range(1, k + 1)],
            [idcg(n, k) for n in range(1, k + 1)])
