"""Percolator: reverse search — match a stream of documents against a
REGISTRY of stored queries (the Elasticsearch percolate / Lucene Monitor
capability: alerting, saved searches, routing rules over an ingest feed).

Forward search asks "which docs match this query"; percolation asks "which
stored queries match this doc". Each stored query here is a term set with a
``minimum_should_match`` floor — the msm algebra already proven on the
forward path (``wand.score_or_msm``): ``min_match = n_terms`` is pure
conjunction (AND), ``1`` is pure disjunction (OR), anything between is the
Lucene msm contract. Terms are analyzed with the SAME fold/tokenize
primitives as the index analyzer, so a registered query matches exactly the
docs the forward engine would return for it.

100 TB shape: the registry is broadcast (saved-search registries run to
~10^5-10^6 rows — megabytes, never corpus-scale) and joined against the
doc-side distinct-term explode, so the corpus NEVER shuffles for candidate
generation; the only exchange is the (doc_id, query_id) match aggregation,
whose size is bounded by actual match volume and is map-side combinable.
Set ``broadcast=False`` for a degenerate registry too big to broadcast.
The plan is stateless join + aggregation, so the same code runs under
Structured Streaming (append docs -> complete/update agg) for live
alerting at ingest.

Reference analogue: none (fates is forward-only, ``lib/query.rb``);
target-new per the survey's serving-surface mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import fold_col, tokens_col


def normalize_queries(queries_df: DataFrame,
                      id_col: str = "query_id",
                      terms_col: str = "terms",
                      msm_col: str = "min_match") -> DataFrame:
    """Analyzer-normalize a stored-query registry: fold each term with the
    index analyzer's ASCII fold, drop empties, dedup (msm counts DISTINCT
    matched terms, mirroring the forward path where a doc matches a term
    once no matter how often the query repeats it). ``min_match`` NULL ->
    n_terms (conjunction); values are clamped to >= 1 but NOT capped at
    n_terms — msm > n_terms is unsatisfiable by the Lucene contract and
    stays so here."""
    terms = F.array_distinct(
        F.filter(F.transform(F.col(terms_col), lambda t: fold_col(t)),
                 lambda t: t != F.lit("")))
    n = F.size(terms)
    msm = F.greatest(F.lit(1), F.coalesce(F.col(msm_col), n))
    return queries_df.select(
        F.col(id_col).cast("int").alias("query_id"),
        terms.alias("terms"),
        msm.cast("int").alias("min_match"),
        n.cast("int").alias("n_terms"))


def percolate(docs: DataFrame, queries_df: DataFrame,
              text_col: str = "text", id_col: str = "doc_id",
              broadcast: bool = True) -> DataFrame:
    """Match every doc against every stored query: output
    ``(doc_id, query_id, n_matched)`` for each (doc, query) pair where the
    doc contains >= ``min_match`` DISTINCT terms of the query, ordered
    (doc_id, query_id). ``n_matched`` counts distinct matched terms.

    Plan: doc -> distinct folded terms (ONE narrow Generate; the emitted
    row is a cheap scalar, Generate-safe) -> equi-join the exploded
    registry (broadcast) -> one combinable count agg -> msm gate."""
    dterms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(
            F.transform(tokens_col(text_col), lambda t: fold_col(t))))
        .alias("term"))
    qx = normalize_queries(queries_df)
    qterms = qx.select("query_id", "min_match",
                       F.explode("terms").alias("term"))
    if broadcast:
        qterms = F.broadcast(qterms)
    matched = (dterms.join(qterms, "term")
               .groupBy("doc_id", "query_id", "min_match")
               .agg(F.count(F.lit(1)).alias("n_matched")))
    return (matched.filter(F.col("n_matched") >= F.col("min_match"))
            .select("doc_id", "query_id", "n_matched")
            .orderBy("doc_id", "query_id"))
