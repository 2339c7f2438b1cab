"""ES ``combined_fields`` query — Lucene's ``CombinedFieldQuery``
(Lucene 8.6+), the principled successor to ``cross_fields``.

Where BM25F (``weights=``) sums per-field BM25 scores and
``cross_fields`` dis-maxes per-field scores under a blended idf,
``combined_fields`` scores ONE pseudo-field built by merging the
fields: a term's tf is the (weighted) SUM of its per-field tfs, the
document length is the (weighted) sum of field lengths, and the
document frequency is the UNION df (docs containing the term in ANY
queried field) — BM25 then runs once over those combined statistics.
A title occurrence literally counts as another body occurrence, which
is the Robertson et al. BM25F-as-field-concatenation model ("Simple
BM25 extension to multiple weighted fields", CIKM 2004) that Lucene
implements.

Float discipline: per-(doc, term) tfs and per-doc dls pivot into a
per-field grid and combine through STATIC expressions (integer tfs
times literal weights, summed in fixed field order), the combined
avgdl derives driver-side from the index's exact per-field sum-dl
stats, the union df comes from one distinct-count over the pruned
posting streams, and the per-doc score is the ascending-term
coalesce-0 static fold — every float op replays in DuckDB, so the twin
hash-checks values.

Scale shape: everything downstream of the pruned posting scan is
match-bounded (tf agg, union-df agg over the same scan, grid pivot,
k-bounded top-k); the corpus row store is never touched.

Reference analogue: none (fates is single-field) — target-new, the
Lucene/ES multi-field ranking surface next to BM25F / dis_max /
cross_fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .analysis import ANALYZERS, ascii_fold
from .oracle import B, K1, idf as idf_fn

__all__ = ["combined_fields_search", "combined_fields_sql"]


def combined_fields_search(index, query, *, k: int = 10,
                           mode: str = "OR",
                           weights: list[float] | None = None,
                           quantize: int | None = 4) -> DataFrame:
    """Top-k (doc_id, score) under combined-field BM25 (module
    docstring). ``weights[f]`` multiplies field f's term counts AND its
    length contribution (the Robertson field weight); default all 1.0
    (pure concatenation)."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = list(weights) if weights is not None else [1.0] * index.n_fields
    if len(w) != index.n_fields:
        raise ValueError(f"need {index.n_fields} weights")
    if all(x == 0.0 for x in w):
        raise ValueError("at least one non-zero field weight")
    tok, _ = ANALYZERS[index.analyzer]
    qterms = sorted({ascii_fold(t) for q in (
        [query] if isinstance(query, str) else query) for t in tok(q)})
    if not qterms:
        raise ValueError("combined_fields needs >= 1 analyzable term")
    stats = index.term_stats(qterms)
    present = sorted(t for t in qterms if t in stats)
    spark = index.spark
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not present or (mode == "AND" and len(present) < len(qterms)):
        return empty

    fields = sorted(f for f in range(index.n_fields) if w[f] != 0.0)
    # combined avgdl from the index's exact per-field sum-dl stats
    avgdl_c = sum(w[f] * index.field_sumdl.get(f, 0.0)
                  for f in fields) / index.n_docs

    hits = index.find_all(present)
    # union df: distinct matching docs per term across the queried fields
    udf = (hits.filter(F.col("field").isin(fields))
           .groupBy("term")
           .agg(F.count_distinct("doc_id").alias("udf")))
    idf_rows = {r["term"]: int(r["udf"]) for r in udf.collect()}
    # combined tf: per-field pivot -> static weighted sum (fixed order)
    tf = (hits.filter(F.col("field").isin(fields))
          .groupBy("doc_id", "term")
          .agg(*[F.sum(F.when(F.col("field") == f, F.lit(1))
                       .otherwise(F.lit(0))).alias(f"tf{f}")
                 for f in fields]))
    tfc = None
    for f in fields:
        c = F.coalesce(F.col(f"tf{f}"), F.lit(0)).cast("double") \
            * F.lit(float(w[f]))
        tfc = c if tfc is None else tfc + c
    # combined dl: per-field lengths pivot the same way
    dl = index.docs.select(
        "doc_id", F.posexplode("dls").alias("field", "dl"))
    dlp = (dl.filter(F.col("field").isin(fields))
           .groupBy("doc_id")
           .agg(*[F.sum(F.when(F.col("field") == f, F.col("dl"))
                        .otherwise(F.lit(0))).alias(f"dl{f}")
                  for f in fields]))
    dlc = None
    for f in fields:
        c = F.coalesce(F.col(f"dl{f}"), F.lit(0)).cast("double") \
            * F.lit(float(w[f]))
        dlc = c if dlc is None else dlc + c
    idf_df = spark.createDataFrame(
        [(t, float(idf_fn(index.n_docs, d)))
         for t, d in sorted(idf_rows.items())], "term string, widf double")
    j = (tf.select("doc_id", "term", tfc.alias("tfc"))
         .join(F.broadcast(idf_df), "term")
         .join(dlp.select("doc_id", dlc.alias("dlc")), "doc_id"))
    part = (F.col("tfc") * F.lit(K1 + 1.0)
            / (F.col("tfc") + F.lit(K1)
               * (F.lit(1.0 - B)
                  + (F.lit(B) * F.col("dlc")) / F.lit(float(avgdl_c)))))
    contrib = j.select("doc_id", "term",
                       (F.col("widf") * part).alias("c"))
    pv = contrib.groupBy("doc_id").agg(
        *[F.sum(F.when(F.col("term") == t, F.col("c"))).alias(f"c{i}")
          for i, t in enumerate(present)],
        F.count_distinct("term").cast("int").alias("n_matched"))
    score = None
    for i in range(len(present)):
        c = F.coalesce(F.col(f"c{i}"), F.lit(0.0))
        score = c if score is None else score + c
    scored = pv.select("doc_id", "n_matched", score.alias("score"))
    if mode == "AND":
        scored = scored.filter(F.col("n_matched") == len(present))
    if quantize:
        qm = float(10 ** quantize)
        scored = scored.withColumn(
            "score", F.floor(F.col("score") * qm) / qm)
    return (scored.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def combined_fields_sql(src: str, terms: list[str], *,
                        field_exprs: list[str],
                        weights: list[float] | None = None,
                        k: int = 10, mode: str = "OR",
                        quantize: int = 4,
                        id_col: str = "doc_id") -> str:
    """DuckDB twin over a corpus whose fields derive from
    ``field_exprs`` (SQL text expressions evaluated per row of
    ``src``): same tokenization, union df, static weighted tf/dl
    combination, BM25 fold, quantize-then-rank."""
    up, lo = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
              "abcdefghijklmnopqrstuvwxyz")
    ws = r"[ \t\n\r\f\v]+"
    w = list(weights) if weights is not None else [1.0] * len(field_exprs)
    qs = sorted({t.lower() for t in terms})
    tlist = ", ".join(f"'{t}'" for t in qs)
    tok_arms = "\n  UNION ALL\n".join(f"""
  SELECT {id_col} AS doc_id, {f} AS field, translate(t, '{up}', '{lo}')
         AS term
  FROM (SELECT {id_col},
               unnest(list_filter(regexp_split_to_array(
                   coalesce({e}, ''), '{ws}'), x -> x <> '')) AS t
        FROM {src})""" for f, e in enumerate(field_exprs))
    tf_sum = " + ".join(
        f"CAST(coalesce(sum(CASE WHEN field = {f} THEN 1 ELSE 0 END), 0)"
        f" AS DOUBLE) * {float(w[f])!r}" for f in range(len(field_exprs)))
    dl_sum = " + ".join(
        f"CAST(coalesce(sum(CASE WHEN field = {f} THEN 1 ELSE 0 END), 0)"
        f" AS DOUBLE) * {float(w[f])!r}" for f in range(len(field_exprs)))
    sums = " + ".join(
        f"coalesce(sum(CASE WHEN term = '{t}' THEN c END), 0.0)"
        for t in qs)
    and_gate = (f"WHERE n_matched = {len(qs)}" if mode == "AND" else "")
    qm = float(10 ** quantize)
    return f"""
WITH tok AS ({tok_arms}
),
nd AS (SELECT count(*) AS n_docs FROM {src}),
dlc AS (
  SELECT d.{id_col} AS doc_id, coalesce(x.dlc, 0.0) AS dlc
  FROM {src} d LEFT JOIN (
    SELECT doc_id, {dl_sum} AS dlc FROM tok GROUP BY doc_id) x
    ON x.doc_id = d.{id_col}
),
avgc AS (SELECT sum(dlc) / (SELECT n_docs FROM nd) AS avgdl FROM dlc),
tfc AS (
  SELECT doc_id, term, {tf_sum} AS tfc
  FROM tok WHERE term IN ({tlist}) GROUP BY doc_id, term
),
udf AS (SELECT term, count(DISTINCT doc_id) AS udf FROM tfc
        GROUP BY term),
contrib AS (
  SELECT tfc.doc_id, tfc.term,
         ln(1 + (nd.n_docs - udf.udf + 0.5) / (udf.udf + 0.5))
         * (tfc.tfc * {K1 + 1.0!r} / (tfc.tfc + {K1!r} *
            ({1.0 - B!r} + ({B!r} * dlc.dlc) / avgc.avgdl))) AS c
  FROM tfc JOIN udf USING (term) JOIN dlc USING (doc_id)
  CROSS JOIN avgc CROSS JOIN nd
),
pv AS (
  SELECT doc_id, CAST(count(DISTINCT term) AS INT) AS n_matched,
         {sums} AS score
  FROM contrib GROUP BY doc_id
),
sc AS (SELECT doc_id, floor(score * {qm!r}) / {qm!r} AS score
       FROM pv {and_gate})
SELECT doc_id, score FROM sc
ORDER BY floor(score * {qm!r}) DESC, doc_id LIMIT {k}
"""
