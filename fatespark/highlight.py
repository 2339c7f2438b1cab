"""Best-passage selection — the Lucene UnifiedHighlighter semantics.

Given a query's terms, pick for every matching document the single passage
(fixed-size token window) that best summarizes why the document matched:
the highlighter's core job beyond marking hits, and the piece the engine's
``ft_snippets`` (first-hit context windows) did not cover.  Lucene's
``PassageScorer`` ranks candidate passages by a BM25-flavoured sum of the
query terms each passage contains; this module reproduces that shape with
an engine-replicable scoring rule:

    score(passage) = sum over query terms t with tf_p(t) > 0 of
                     idf(t) * (1 + ln(tf_p(t)))

with ``idf(t) = ln(1 + (N - df_t + 0.5)/(df_t + 0.5))`` — the same BM25
idf the ranking kernels use (Robertson-Sparck Jones; Lucene
``BM25Similarity.idf``), N = docs with >= 1 token, df over whole
documents.  Ties (equal score bits) break toward the EARLIEST passage,
Lucene's lead-bias.  Passages are ``chunk.chunk_docs`` windows
(``overlap=0`` — Lucene breaks on sentences via BreakIterator; fixed
token windows are this engine's deterministic, locale-free analogue).

Float determinism: idf values are each ONE fixed expression over (N, df)
and per-passage scores sum the terms in the CALLER'S term order as one
static expression tree (no data-dependent fold needed: the term list is
query-sized) — bit-identical in the DuckDB twin, so score ordering and
the argmax agree exactly across engines.

100 TB shape: the df pass aggregates ONLY the query's terms (rows are
filtered to the term list before the hash agg — a q-row table, broadcast
as a 1-row idf struct); chunking and per-passage term counting are
narrow whole-stage-codegen projections (one Generate per doc, the cheap
scalar-index explode); the per-doc argmax is ONE row_number window on
doc_id (shuffle by doc — at 10^12 docs swap to the map-side-combinable
``max_by(struct(...), struct(score, -chunk_idx))`` agg, same result by
uniqueness of chunk_idx; the window form is kept because its tiebreak
mirrors the SQL twin textually).

Reference analogue: none (fates returns raw offsets, the caller renders
context); target-new, the web-search serving surface the survey mandates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .chunk import chunk_docs
from .textops import LOWER, UPPER, WS_RE

__all__ = ["best_passages", "best_passages_sql"]


def _fold_tokens(text_col: str):
    raw = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), WS_RE),
                   lambda x: x != F.lit(""))
    return F.transform(raw, lambda x: F.translate(x, UPPER, LOWER))


def best_passages(docs: DataFrame, terms: list[str],
                  text_col: str = "text", id_col: str = "doc_id",
                  passage_size: int = 16, quantize: int = 6) -> DataFrame:
    """(doc_id, chunk_idx, n_terms, score, passage) — the top-scoring
    passage per document containing >= 1 query term; ``n_terms`` = how
    many DISTINCT query terms the winning passage covers, ``score``
    floor-quantized to ``quantize`` decimals AFTER the argmax (ordering
    uses full-precision bits), ``passage`` = the window's text
    (single-space re-join, the chunker's contract)."""
    if not terms:
        raise ValueError("best_passages needs >= 1 query term")
    terms = [t.lower() for t in terms]

    # corpus df for JUST the query terms -> one broadcast 1-row struct
    toks = _fold_tokens(text_col)
    base = (docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
            .filter(F.size("toks") >= 1))
    tl = F.array(*[F.lit(t) for t in terms])
    dfs = (base.select(F.explode(F.array_distinct(
               F.filter(F.col("toks"), lambda x: F.array_contains(tl, x))))
               .alias("t"))
           .groupBy("t").agg(F.count("*").alias("df")))
    ndocs = base.agg(F.count("*").alias("n"))
    # pivot the q-row df table into one row of idf columns (missing term
    # -> df 0 -> idf of the never-seen term; harmless, tf will be 0)
    idfrow = (dfs.crossJoin(F.broadcast(ndocs))
              .select("n", "t", "df")
              .groupBy("n")
              .pivot("t", terms).agg(F.first("df"))
              .select(F.col("n"), *[
                  F.log(F.lit(1.0)
                        + (F.col("n").cast("double")
                           - F.coalesce(F.col(t).cast("double"), F.lit(0.0))
                           + F.lit(0.5))
                        / (F.coalesce(F.col(t).cast("double"), F.lit(0.0))
                           + F.lit(0.5))).alias(f"_idf_{i}")
                  for i, t in enumerate(terms)]))

    ch = chunk_docs(docs.select(F.col(id_col).alias("doc_id"), text_col),
                    text_col=text_col, id_col="doc_id",
                    size=passage_size, overlap=0)
    ptoks = F.transform(F.split(F.col("chunk_text"), " "),
                        lambda x: F.translate(x, UPPER, LOWER))
    scored = ch.select("doc_id", "chunk_idx",
                       F.col("chunk_text").alias("passage"),
                       ptoks.alias("_pt"))
    def _eq(term):
        # one-parameter closure: a `lambda x, t=t` default arg would make
        # F.filter pass (element, index) and bind t to the array index
        lit = F.lit(term)
        return lambda x: x == lit

    for i, t in enumerate(terms):
        scored = scored.withColumn(
            f"_tf_{i}", F.size(F.filter(F.col("_pt"), _eq(t))))
    score = None
    nterms = None
    for i in range(len(terms)):
        tfc = F.col(f"_tf_{i}").cast("double")
        contrib = F.when(F.col(f"_tf_{i}") > 0,
                         F.col(f"_idf_{i}") * (F.lit(1.0) + F.log(tfc))) \
                   .otherwise(F.lit(0.0))
        hit = F.when(F.col(f"_tf_{i}") > 0, 1).otherwise(0)
        score = contrib if score is None else score + contrib
        nterms = hit if nterms is None else nterms + hit
    scored = (scored.crossJoin(F.broadcast(idfrow))
              .select("doc_id", "chunk_idx", "passage",
                      nterms.cast("int").alias("n_terms"),
                      score.alias("_score"))
              .filter(F.col("n_terms") > 0))
    w = Window.partitionBy("doc_id").orderBy(F.col("_score").desc(),
                                             F.col("chunk_idx").asc())
    mul = float(10 ** quantize)
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("doc_id", "chunk_idx", "n_terms",
                    (F.floor(F.col("_score") * mul) / mul).alias("score"),
                    "passage"))


def best_passages_sql(src: str, terms: list[str], passage_size: int = 16,
                      quantize: int = 6, text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """DuckDB twin of ``best_passages`` — same chunker, same idf, same
    static score expression, same window tiebreak; hash-exact."""
    if not terms:
        raise ValueError("best_passages_sql needs >= 1 query term")
    terms = [t.lower() for t in terms]
    from .chunk import chunk_docs_sql
    mul = float(10 ** quantize)
    tf_cols = ",\n         ".join(
        f"len(list_filter(pt, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms))
    idf_cols = ",\n         ".join(
        "ln(1.0 + (CAST(n AS DOUBLE) - coalesce(CAST(df_{i} AS DOUBLE), "
        "0.0) + 0.5) / (coalesce(CAST(df_{i} AS DOUBLE), 0.0) + 0.5)) "
        "AS idf_{i}".format(i=i) for i in range(len(terms)))
    df_cols = ",\n         ".join(
        f"count(*) FILTER (WHERE t = '{t}') AS df_{i}"
        for i, t in enumerate(terms))
    score_expr = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN idf_{i} * (1.0 + ln(CAST(tf_{i} AS "
        f"DOUBLE))) ELSE 0.0 END)" for i in range(len(terms)))
    hits_expr = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)"
        for i in range(len(terms)))
    return f"""
WITH chunks AS ({chunk_docs_sql(src, size=passage_size, overlap=0,
                                text_col=text_col, id_col=id_col)}),
fbase AS (
  SELECT {id_col} AS doc_id,
         list_transform(
           list_filter(regexp_split_to_array(coalesce({text_col}, ''),
                                             '{WS_RE}'), x -> x <> ''),
           x -> translate(x, '{UPPER}', '{LOWER}')) AS toks
  FROM {src}
),
fdocs AS (SELECT doc_id, toks FROM fbase WHERE len(toks) >= 1),
dfs AS (
  SELECT {df_cols}
  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS t FROM fdocs)
),
nd AS (SELECT count(*) AS n FROM fdocs),
idfs AS (
  SELECT {idf_cols}
  FROM dfs CROSS JOIN nd
),
ptoks AS (
  SELECT doc_id, chunk_idx, chunk_text AS passage,
         list_transform(string_split(chunk_text, ' '),
                        x -> translate(x, '{UPPER}', '{LOWER}')) AS pt
  FROM chunks
),
tfs AS (
  SELECT doc_id, chunk_idx, passage,
         {tf_cols}
  FROM ptoks
),
scoredp AS (
  SELECT doc_id, chunk_idx, passage,
         CAST({hits_expr} AS INTEGER) AS n_terms,
         {score_expr} AS s
  FROM tfs CROSS JOIN idfs
),
ranked AS (
  SELECT doc_id, chunk_idx, n_terms, s, passage,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, chunk_idx ASC) AS rn
  FROM scoredp WHERE n_terms > 0
)
SELECT doc_id, chunk_idx, n_terms,
       floor(s * {mul}) / {mul} AS score, passage
FROM ranked WHERE rn = 1"""


def best_passages_python(docs: list, terms: list[str],
                         passage_size: int = 16, quantize: int = 6):
    """Pure-python twin for tests: same tokens, same windows, same score
    expression, same tiebreak.  ``docs`` is [(doc_id, text)]."""
    import re as _re
    ws = _re.compile(r"[ \t\n\r\f\x0B]+")
    terms = [t.lower() for t in terms]

    def fold(s):
        return "".join(c.lower() if "A" <= c <= "Z" else c for c in s)

    def tok(s):
        return [w for w in ws.split(s or "") if w]

    raw = {d: tok(t) for d, t in docs}
    folded = {d: [fold(w) for w in v] for d, v in raw.items()}
    n = sum(1 for v in folded.values() if v)
    dfs = {t: sum(1 for v in folded.values() if v and t in set(v))
           for t in terms}
    idf = {t: math.log(1.0 + (float(n) - float(dfs[t]) + 0.5)
                       / (float(dfs[t]) + 0.5)) for t in terms}
    mul = float(10 ** quantize)
    out = {}
    for did, text in docs:
        toks = folded[did]
        rtoks = raw[did]
        best = None
        ci = 0
        while ci * passage_size < len(toks):
            win = toks[ci * passage_size:(ci + 1) * passage_size]
            s = 0.0
            hits = 0
            for t in terms:
                tf = win.count(t)
                if tf > 0:
                    s = s + idf[t] * (1.0 + math.log(float(tf)))
                    hits += 1
            if hits > 0 and (best is None or s > best[3]):
                best = (ci, hits, math.floor(s * mul) / mul, s,
                        " ".join(rtoks[ci * passage_size:
                                       (ci + 1) * passage_size]))
            ci += 1
        if best is not None:
            out[did] = (best[0], best[1], best[2], best[4])
    return out
