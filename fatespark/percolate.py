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


def percolate_phrases(docs: DataFrame, queries_df: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      broadcast: bool = True,
                      max_phrases: int = 100_000) -> DataFrame:
    """Percolation with PHRASE constraints — the Lucene Monitor shape:
    every stored query keeps the terms + ``min_match`` candidate gate
    (for a pure match_phrase saved search, register the phrase's tokens
    with ``min_match = n`` — the conjunctive pre-filter Monitor derives
    automatically), and rows with a non-null ``phrase`` column
    additionally require the folded phrase to occur ADJACENTLY in the
    document (the exact verify step on the candidate set).

    Plan: candidate generation is the unchanged broadcast terms path
    (corpus never shuffles); phrase verification is a NARROW per-doc
    pass — phrases are collected driver-side (registries are
    query-bounded by the same contract that lets them broadcast;
    ``max_phrases`` guards the degenerate case) and each doc emits the
    ids of phrases it contains via literal adjacency expressions; the
    final gate is a match-bounded equi-join. Zero corpus-side shuffles.
    """
    from .analysis import ascii_fold

    preg = [(int(r["query_id"]),
             [ascii_fold(t) for t in r["phrase"]])
            for r in queries_df.select("query_id", "phrase")
            .where(F.col("phrase").isNotNull()).collect()]
    if len(preg) > max_phrases:
        raise ValueError(f"{len(preg)} phrase queries > max_phrases="
                         f"{max_phrases}; shard the registry")
    cand = percolate(docs, queries_df.select("query_id", "terms",
                                             "min_match"),
                     text_col=text_col, id_col=id_col,
                     broadcast=broadcast)
    if not preg:
        return cand

    toks = F.array_compact(
        F.transform(tokens_col(text_col), lambda t: fold_col(t)))
    flags = []
    for qid, ptoks in preg:
        L = len(ptoks)
        if L == 0:
            continue
        hit = F.exists(
            F.sequence(F.lit(1), F.size("_toks") - F.lit(L - 1)),
            lambda i: F.aggregate(
                F.sequence(F.lit(0), F.lit(L - 1)),
                F.lit(True),
                lambda acc, j: acc & (F.element_at("_toks", (i + j)
                                                   .cast("int"))
                                      == F.element_at(
                                          F.array(*[F.lit(t)
                                                    for t in ptoks]),
                                          (j + 1).cast("int")))))
        flags.append(F.when((F.size("_toks") >= L) & hit, F.lit(qid)))
    pairs = (docs.select(F.col(id_col).alias("doc_id"),
                         toks.alias("_toks"))
             .select("doc_id",
                     F.explode(F.array_compact(F.array(*flags)))
                     .alias("query_id")))
    ph_ids = [qid for qid, _ in preg]
    out = cand.join(pairs.withColumn("_ok", F.lit(1)),
                    ["doc_id", "query_id"], "left")
    return (out.filter(~F.col("query_id").isin(ph_ids)
                       | F.col("_ok").isNotNull())
            .select("doc_id", "query_id", "n_matched")
            .orderBy("doc_id", "query_id"))
