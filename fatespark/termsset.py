"""terms_set query — ES ``terms_set``: per-document minimum-should-match.

The plain msm query (``ft_msm``) uses one query-constant floor; ES's
``terms_set`` reads the floor from a FIELD of each document
(``minimum_should_match_field``) — "match this skill list against the
candidate's own required-skill count" — i.e. Lucene's ``CoveringQuery``.
A doc qualifies iff it contains >= its own floor of the query's DISTINCT
terms; qualifying docs keep the full disjunctive BM25 sum (the msm
contract proven on the forward path).

Implementation is relational over the index primitives (the explain()
precedent): per-(doc, term, field) tfs from the posting streams, the
k-row idf/avgdl tables broadcast, the score a STATIC coalesce-0 sum over
the sorted (term, field) grid — adding literal 0.0 is an IEEE identity,
so the fold is bit-identical to summing only the present terms in sorted
order, which is what the SQL twin does. The per-doc floor joins from the
caller's docs table (match-bounded), clamps to >= 1 (the CoveringQuery
contract), and floors above the distinct-term count are unsatisfiable.

100 TB shape: posting scans are term-pruned; everything downstream is
bounded by the MATCH volume (tf agg, floor join, k-bounded top-k) —
the corpus table is touched only by the doc_id equi-join that delivers
the floor field.

Reference analogue: none (fates has no per-doc query semantics) —
target-new, the ES terms_set surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .analysis import ANALYZERS, ascii_fold
from .oracle import B, K1, idf as idf_fn

__all__ = ["terms_set_search", "terms_set_sql"]


def terms_set_search(index, docs: DataFrame, terms: list[str],
                     msm_col: str, k: int = 10, *,
                     quantize: int | None = None,
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_matched, req_m, score) top-k: docs matching >= their
    own ``msm_col`` floor of the query's distinct terms, scored with the
    full OR BM25 sum, ordered (score DESC, doc_id ASC)."""
    tok, _ = ANALYZERS[index.analyzer]
    qterms = sorted({ascii_fold(t) for q in terms for t in tok(q)})
    if not qterms:
        raise ValueError("terms_set needs >= 1 analyzable term")
    stats = index.term_stats(qterms)
    present = sorted(t for t in qterms if t in stats)
    spark = index.spark
    if not present:
        return spark.createDataFrame(
            [], "doc_id long, n_matched int, req_m int, score double")

    hits = index.find_all(present)
    tf = (hits.groupBy("doc_id", "term", "field")
          .agg(F.count("*").alias("tf")))
    dl = (index.docs.select("doc_id",
                            F.posexplode("dls").alias("field", "dl")))
    grid = sorted((t, int(f)) for t in present for f in stats[t])
    idf_rows = [(t, f, float(idf_fn(index.n_docs, stats[t][f]["df"])))
                for t, f in grid]
    idf_df = spark.createDataFrame(idf_rows,
                                   "term string, field int, widf double")
    favg = spark.createDataFrame(
        [(int(f), float(a)) for f, a in sorted(index.field_avgdl.items())],
        "field int, avgdl double")
    j = (tf.join(F.broadcast(idf_df), ["term", "field"])
         .join(F.broadcast(favg), "field")
         .join(dl, ["doc_id", "field"]))
    tfd, dld = F.col("tf").cast("double"), F.col("dl").cast("double")
    part = (tfd * F.lit(K1 + 1.0)
            / (tfd + F.lit(K1) * ((F.lit(1.0) - F.lit(B))
                                  + (F.lit(B) * dld) / F.col("avgdl"))))
    contrib = j.select("doc_id", "term", "field",
                       (F.col("widf") * part).alias("c"))
    pv = contrib.groupBy("doc_id").agg(
        *[F.sum(F.when((F.col("term") == t) & (F.col("field") == f),
                       F.col("c"))).alias(f"c{i}")
          for i, (t, f) in enumerate(grid)],
        F.count_distinct("term").cast("int").alias("n_matched"))
    score = None
    for i in range(len(grid)):
        c = F.coalesce(F.col(f"c{i}"), F.lit(0.0))
        score = c if score is None else score + c
    floors = docs.select(F.col(id_col).alias("doc_id"),
                         F.greatest(F.lit(1), F.col(msm_col).cast("int"))
                         .alias("req_m"))
    out = (pv.select("doc_id", "n_matched", score.alias("score"))
           .join(floors, "doc_id")
           .filter(F.col("n_matched") >= F.col("req_m")))
    if quantize:
        qm = float(10 ** quantize)
        out = out.withColumn("score",
                             F.floor(F.col("score") * qm) / qm)
    return (out.select("doc_id", "n_matched", "req_m", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def terms_set_sql(src: str, terms: list[str], msm_expr: str, k: int = 10,
                  *, quantize: int = 4, text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    """DuckDB twin (single-field corpus): same tf/df/dl/idf expressions,
    the same sorted-term coalesce-0 static sum, the same clamp, filter,
    order and cut.  ``msm_expr`` is the per-doc floor expression over
    ``src`` (e.g. ``doc_id % 3 + 1``)."""
    up, lo = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
              "abcdefghijklmnopqrstuvwxyz")
    ws = r"[ \t\n\r\f\v]+"
    qs = sorted({t.lower() for t in terms})
    tlist = ", ".join(f"'{t}'" for t in qs)
    sums = " + ".join(
        f"coalesce(sum(CASE WHEN term = '{t}' THEN c END), 0.0)"
        for t in qs)
    return f"""
WITH ptok AS (
  SELECT {id_col} AS doc_id, translate(unnest(toks), '{up}', '{lo}') AS term
  FROM (SELECT {id_col},
               list_filter(regexp_split_to_array(coalesce({text_col}, ''),
                                                 '{ws}'), x -> x <> '') AS toks
        FROM {src})
),
dls AS (
  SELECT d.{id_col} AS doc_id, coalesce(x.dl, 0) AS dl
  FROM {src} d LEFT JOIN (
    SELECT doc_id, count(*) AS dl FROM ptok GROUP BY doc_id) x
    ON x.doc_id = d.{id_col}
),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dls
),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM ptok
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
contrib AS (
  SELECT tfs.doc_id, tfs.term,
         ln(1 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
         * (tfs.tf * {K1 + 1.0!r} / (tfs.tf + {K1!r} *
            ({1.0 - B!r} + ({B!r} * dls.dl) / stats.avgdl))) AS c
  FROM tfs JOIN dfs USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats
),
pv AS (
  SELECT doc_id, CAST(count(DISTINCT term) AS INT) AS n_matched,
         {sums} AS score
  FROM contrib GROUP BY doc_id
),
fl AS (
  SELECT {id_col} AS doc_id,
         CAST(greatest(1, {msm_expr}) AS INT) AS req_m
  FROM {src}
)
SELECT pv.doc_id AS doc_id, n_matched, req_m,
       floor(score * {float(10 ** quantize)!r}) / {float(10 ** quantize)!r}
       AS score
FROM pv JOIN fl ON fl.doc_id = pv.doc_id
WHERE n_matched >= req_m
ORDER BY floor(score * {float(10 ** quantize)!r}) DESC, pv.doc_id
LIMIT {k}"""
