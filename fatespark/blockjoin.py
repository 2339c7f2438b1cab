"""Parent/child joined search — ES ``has_child`` (Lucene
``ToParentBlockJoinQuery``) and the child-side expansion (Lucene
``ToChildBlockJoinQuery``).

The join-field model: every doc carries a parent key (site, crawl batch,
thread id — ES's ``join`` field / Lucene's block grouping). ``has_child``
ranks PARENTS by their matching children: each matching child is scored
with the full relational BM25 kernel (``bucketaggs.match_scores`` — the
``terms_set``/``top_hits_scored`` fold, bit-identical to ``search()``),
then one group aggregation per parent combines child scores under an ES
``score_mode`` (max / sum / avg / min / none). ``to_children`` goes the
other way: every child of a matching parent family, carrying the family
score — the "keep the whole site if any page matches" expansion a crawl
curation pipeline uses.

Float discipline: child scores are floor-quantized to INT64 codes
*before* the group aggregation, so sum/avg folds are order-independent
exact integer arithmetic (the MaxSim/MMR precedent) — no float-fold
order to pin; max/min are order-free anyway. The reported double derives
from the integer code by a fixed expression (one or two divisions),
deterministic and replayable cross-engine, so a DuckDB twin hash-checks
scores AND ranks.

Scale shape: everything downstream of the pruned posting scan is
MATCH-bounded; the parent agg is one map-side-combinable shuffle on the
parent key (hot families partial-aggregate before moving); the top-k is
a ``TakeOrderedAndProject``. ``to_children``'s output is family-sized by
semantics (as in ES) — it composes with a LIMIT or a per-family cap.

Reference analogue: none (fates has no joined queries) — target-new, the
ES/Lucene block-join surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .bucketaggs import match_scores
from .oracle import B, K1

__all__ = ["has_child_topk", "has_child_inner_hits", "to_children",
           "has_child_sql", "to_children_sql", "inner_hits_sql"]

_MODES = ("max", "sum", "avg", "min", "none")


def _family_scores(index, children: DataFrame, query, parent_col: str,
                   score_mode: str, mode: str, quantize: int,
                   min_children: int, id_col: str) -> DataFrame:
    """(parent, score, n_children) for every parent with >= min_children
    matching children — the shared core of both directions."""
    if score_mode not in _MODES:
        raise ValueError(f"score_mode must be one of {_MODES}")
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    qm = float(10 ** quantize)
    scored = match_scores(index, query, mode=mode)
    code = F.floor(F.col("score") * F.lit(qm)).cast("long")
    par = children.select(F.col(id_col).alias("doc_id"),
                          F.col(parent_col).cast("string").alias("parent"))
    g = (scored.select("doc_id", code.alias("code"))
         .join(par, "doc_id")
         .groupBy("parent")
         .agg(F.max("code").alias("maxc"), F.min("code").alias("minc"),
              F.sum("code").alias("sumc"),
              F.count(F.lit(1)).alias("n_children"))
         .filter(F.col("n_children") >= min_children))
    if score_mode == "max":
        s = F.col("maxc").cast("double") / F.lit(qm)
    elif score_mode == "min":
        s = F.col("minc").cast("double") / F.lit(qm)
    elif score_mode == "sum":
        s = F.col("sumc").cast("double") / F.lit(qm)
    elif score_mode == "avg":
        s = (F.col("sumc").cast("double") / F.lit(qm)) \
            / F.col("n_children").cast("double")
    else:  # none — membership only, the ES constant-score mode
        s = F.lit(0.0)
    return g.select("parent", s.alias("score"), "n_children")


def has_child_topk(index, children: DataFrame, query, parent_col: str,
                   *, k: int = 10, score_mode: str = "max",
                   mode: str = "OR", min_children: int = 1,
                   quantize: int = 4,
                   id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` PARENTS by their matching children (module docstring):
    (parent, score, n_children) ordered (score DESC, parent ASC).
    ``score_mode`` follows ES ``has_child``: max (default) / sum / avg /
    min / none; ``min_children`` is ES's matching-children floor."""
    if k <= 0:
        raise ValueError("k must be positive")
    fam = _family_scores(index, children, query, parent_col, score_mode,
                         mode, quantize, min_children, id_col)
    return fam.orderBy(F.desc("score"), F.asc("parent")).limit(k)


def has_child_inner_hits(index, children: DataFrame, query,
                         parent_col: str, *, k: int = 10, n: int = 3,
                         score_mode: str = "max", mode: str = "OR",
                         min_children: int = 1, quantize: int = 4,
                         id_col: str = "doc_id") -> DataFrame:
    """ES ``has_child`` with ``inner_hits``: for each of the top-``k``
    parents, the ``n`` best-matching CHILDREN that produced its score —
    (parent, parent_score, doc_id, child_score, hit_rank), hit_rank
    1-based within the parent by (child score DESC, doc_id ASC).

    Shape: the ``has_child_topk`` family ranking (k-bounded) joins back
    to the scored children — the k-row parent side broadcasts, so the
    only added cost beyond the parent ranking is one window over the
    <= k families' matching children. Child scores report from the same
    integer codes the parent fold consumed (floor-quantized), so a
    DuckDB twin reproduces rows and ranks hash-exactly."""
    if k <= 0 or n <= 0:
        raise ValueError("k and n must be positive")
    qm = float(10 ** quantize)
    fam = _family_scores(index, children, query, parent_col, score_mode,
                         mode, quantize, min_children, id_col)
    top = (fam.orderBy(F.desc("score"), F.asc("parent")).limit(k)
           .select("parent", F.col("score").alias("parent_score")))
    scored = match_scores(index, query, mode=mode)
    code = F.floor(F.col("score") * F.lit(qm)).cast("long")
    par = children.select(F.col(id_col).alias("doc_id"),
                          F.col(parent_col).cast("string").alias("parent"))
    ch = (scored.select("doc_id", (code / F.lit(qm))
                        .alias("child_score"))
          .join(par, "doc_id")
          .join(F.broadcast(top), "parent"))
    w = Window.partitionBy("parent").orderBy(F.desc("child_score"),
                                             F.asc("doc_id"))
    return (ch.withColumn("hit_rank", F.row_number().over(w))
            .filter(F.col("hit_rank") <= n)
            .select("parent", "parent_score", "doc_id", "child_score",
                    "hit_rank"))


def to_children(index, children: DataFrame, query, parent_col: str,
                *, score_mode: str = "max", mode: str = "OR",
                min_children: int = 1, quantize: int = 4,
                k: int | None = None,
                id_col: str = "doc_id") -> DataFrame:
    """Every CHILD of a family with a matching member, carrying the
    family score (Lucene ``ToChildBlockJoinQuery``): (doc_id, parent,
    score) — the row set a site-level keep/drop rule consumes. With
    ``k``, the k best rows by (score DESC, doc_id ASC)."""
    fam = _family_scores(index, children, query, parent_col, score_mode,
                         mode, quantize, min_children, id_col)
    par = children.select(F.col(id_col).alias("doc_id"),
                          F.col(parent_col).cast("string").alias("parent"))
    out = par.join(fam.select("parent", "score"), "parent") \
             .select("doc_id", "parent", "score")
    if k is not None:
        if k <= 0:
            raise ValueError("k must be positive")
        out = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return out


def _fam_ctes(src: str, terms: list[str], parent_expr: str,
              score_mode: str, mode: str, min_children: int,
              quantize: int, text_col: str, id_col: str) -> str:
    """Shared WITH-body through the ``fam`` CTE: the
    ``top_hits_scored_sql`` BM25 chain, child scores cut to BIGINT codes
    with the same floor, the same integer group fold and derived
    double."""
    up, lo = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
              "abcdefghijklmnopqrstuvwxyz")
    ws = r"[ \t\n\r\f\v]+"
    qs = sorted({t.lower() for t in terms})
    tlist = ", ".join(f"'{t}'" for t in qs)
    sums = " + ".join(
        f"coalesce(sum(CASE WHEN term = '{t}' THEN c END), 0.0)"
        for t in qs)
    and_gate = (f"WHERE n_matched = {len(qs)}" if mode == "AND" else "")
    qm = float(10 ** quantize)
    sexpr = {
        "max": f"CAST(max(code) AS DOUBLE) / {qm!r}",
        "min": f"CAST(min(code) AS DOUBLE) / {qm!r}",
        "sum": f"CAST(sum(code) AS DOUBLE) / {qm!r}",
        "avg": f"(CAST(sum(code) AS DOUBLE) / {qm!r})"
               " / CAST(count(*) AS DOUBLE)",
        "none": "0.0",
    }[score_mode]
    return f"""ptok AS (
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
codes AS (
  SELECT d.doc_id,
         CAST({parent_expr} AS VARCHAR) AS parent,
         CAST(floor(sc.score * {qm!r}) AS BIGINT) AS code
  FROM (SELECT doc_id, score FROM pv {and_gate}) sc
  JOIN {src} d ON d.{id_col} = sc.doc_id
),
fam AS (
  SELECT parent, {sexpr} AS score,
         CAST(count(*) AS BIGINT) AS n_children
  FROM codes GROUP BY parent
  HAVING count(*) >= {min_children}
)"""


def has_child_sql(src: str, terms: list[str], parent_expr: str,
                  *, k: int = 10, score_mode: str = "max",
                  mode: str = "OR", min_children: int = 1,
                  quantize: int = 4, text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    """DuckDB twin of ``has_child_topk``: the shared ``fam`` chain plus
    the same ordering and cut."""
    body = _fam_ctes(src, terms, parent_expr, score_mode, mode,
                     min_children, quantize, text_col, id_col)
    return f"""
WITH {body}
SELECT parent, score, n_children
FROM fam
ORDER BY score DESC, parent ASC
LIMIT {k}
"""


def inner_hits_sql(src: str, terms: list[str], parent_expr: str,
                   *, k: int = 10, n: int = 3, score_mode: str = "max",
                   mode: str = "OR", min_children: int = 1,
                   quantize: int = 4, text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB twin of ``has_child_inner_hits``: the shared ``fam`` chain,
    top-k parents, children re-joined from the same integer codes, same
    per-parent window and cut."""
    body = _fam_ctes(src, terms, parent_expr, score_mode, mode,
                     min_children, quantize, text_col, id_col)
    qm = float(10 ** quantize)
    return f"""
WITH {body},
topk AS (
  SELECT parent, score AS parent_score FROM fam
  ORDER BY score DESC, parent ASC LIMIT {k}
),
ih AS (
  SELECT c.parent, t.parent_score, c.doc_id,
         CAST(c.code AS DOUBLE) / {qm!r} AS child_score
  FROM codes c JOIN topk t USING (parent)
),
r AS (
  SELECT parent, parent_score, doc_id, child_score,
         CAST(row_number() OVER (
           PARTITION BY parent
           ORDER BY child_score DESC, doc_id ASC) AS INT) AS hit_rank
  FROM ih
)
SELECT parent, parent_score, doc_id, child_score, hit_rank
FROM r WHERE hit_rank <= {n}
ORDER BY parent_score DESC, parent ASC, hit_rank
"""


def to_children_sql(src: str, terms: list[str], parent_expr: str,
                    *, k: int | None = None, score_mode: str = "max",
                    mode: str = "OR", min_children: int = 1,
                    quantize: int = 4, text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB twin of ``to_children``: the shared ``fam`` chain joined
    back to every child of a matching family, same optional cut."""
    body = _fam_ctes(src, terms, parent_expr, score_mode, mode,
                     min_children, quantize, text_col, id_col)
    cut = (f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
           if k is not None else "")
    return f"""
WITH {body}
SELECT d.{id_col} AS doc_id,
       CAST({parent_expr} AS VARCHAR) AS parent, fam.score
FROM {src} d
JOIN fam ON fam.parent = CAST({parent_expr} AS VARCHAR)
{cut}
"""
