"""Second-pass rescoring over a BM25 candidate window.

The web-search pattern the reference cannot express (fates ranks purely by
match count over a suffix array, ``lib/fates.rb:60-71``): retrieve a
candidate pool of the top ``pool`` documents by BM25, then re-rank that
bounded window with a document-level signal — recency decay, or a
per-group diversity cap ("site collapsing"). Both are *rescoring-window*
semantics, the same contract as Lucene's rescorer / Elasticsearch
``rescore``: exact within the window, and the window itself is the exact
global BM25 top-``pool`` (SearchIndex.search's total order).

Scale shape: the expensive part is the first-pass ``search()`` (one
postings scan, per-bucket top-k, tiny global merge). The rescoring pass
touches only ``pool`` rows: the candidate set is broadcast into a join
against the document-metadata table, so the metadata scan is pruned by the
broadcast hash join (no shuffle of the corpus, no second postings scan).
At 10^12 docs the metadata side is the Iceberg doc table; the join reads
only the (doc_id, signal) columns and AQE turns it into a broadcast join
exactly as written here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["recency_topk", "collapsed_topk", "decay_topk",
           "static_rank_topk", "field_value_factor_topk"]


def _quantize(col, quantize: int | None):
    if quantize is None:
        return col
    mul = float(10 ** quantize)
    return F.floor(col * mul) / mul


def recency_topk(index, meta: DataFrame, query, *, half_life_days: float,
                 now_ts: int, ts_col: str = "warc_ts", k: int = 10,
                 pool: int = 100, mode: str = "OR",
                 quantize: int | None = None,
                 use_wand: bool = False) -> DataFrame:
    """Top-k by recency-decayed BM25: ``score * 2^(-age_days/half_life)``.

    ``meta`` must carry (doc_id, ``ts_col``) where ``ts_col`` is a
    timestamp or epoch-seconds column (crawl time — ``warc_ts`` on the
    Common-Crawl-shaped corpus). ``now_ts`` is epoch seconds "now"; passed
    explicitly (never wall clock) so results are reproducible.

    Exact within the BM25 top-``pool`` window. Because the decay factor is
    ≤ 1, any document whose BM25 score is below the final boosted top-k
    threshold can never enter the top-k — so with ``pool`` large enough
    that the pool's floor BM25 is below ``k``-th boosted score, the window
    result equals the full-corpus result; the caller controls the
    exactness/cost trade-off, as in Lucene's rescorer.
    """
    cand = index.search(query, k=pool, mode=mode, quantize=quantize,
                        use_wand=use_wand)
    ts = F.col(ts_col)
    # timestamp -> epoch seconds; already-numeric columns pass through
    if dict(meta.dtypes).get(ts_col) in ("timestamp", "timestamp_ntz",
                                         "date"):
        ts = ts.cast("long")
    # clamp at age 0: a future/clock-skewed timestamp would give decay > 1,
    # breaking the window-exactness invariant (decay <= 1) documented above
    age_days = F.greatest(
        (F.lit(float(now_ts)) - ts.cast("double")) / F.lit(86400.0),
        F.lit(0.0))
    decay = F.pow(F.lit(2.0), -(age_days / F.lit(float(half_life_days))))
    j = (meta.select("doc_id", decay.alias("_decay"))
         .join(F.broadcast(cand), "doc_id"))
    boosted = _quantize(F.col("score") * F.col("_decay"), quantize)
    return (j.select("doc_id", boosted.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def collapsed_topk(index, meta: DataFrame, query, *, group_col: str,
                   per_group: int = 1, k: int = 10, pool: int = 100,
                   mode: str = "OR", quantize: int | None = None,
                   use_wand: bool = False) -> DataFrame:
    """Diversity-capped top-k ("site collapsing"): at most ``per_group``
    results per value of ``group_col`` (host, source, dup-cluster id, …),
    ranked by BM25 within the exact top-``pool`` window.

    Returns (doc_id, ``group_col``, score, grp_rank) in global
    (score DESC, doc_id ASC) order; ``grp_rank`` is the 1-based rank of
    the doc within its group. The window function runs over ``pool`` rows
    only — the per-group partitioning never touches the corpus.
    """
    cand = index.search(query, k=pool, mode=mode, quantize=quantize,
                        use_wand=use_wand)
    j = meta.select("doc_id", group_col).join(F.broadcast(cand), "doc_id")
    w = Window.partitionBy(group_col).orderBy(F.desc("score"),
                                              F.asc("doc_id"))
    return (j.withColumn("grp_rank", F.row_number().over(w))
            .filter(F.col("grp_rank") <= per_group)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", group_col, "score", "grp_rank"))


def static_rank_topk(index, prior: DataFrame, query, *,
                     rank_col: str = "rank", node_col: str = "node",
                     k: int = 10, pool: int = 100, mode: str = "OR",
                     quantize: int | None = None,
                     use_wand: bool = False) -> DataFrame:
    """Top-k by static-rank-fused BM25: ``score * (rank / max_rank)`` —
    the classic web-search prior fusion (Brin & Page, "The Anatomy of a
    Large-Scale Hypertextual Web Search Engine", WWW 1998: the IR score
    combined with PageRank as a query-independent prior).

    ``prior`` carries (``node_col``, ``rank_col``) keyed by doc_id —
    e.g. ``linkgraph.pagerank`` output, whose integer fixed-point ranks
    divide bit-reproducibly. Normalizing by the prior's max makes the
    fusion factor <= 1, so recency_topk's window-exactness argument
    holds verbatim: a doc whose raw BM25 is below the final k-th fused
    score can never enter the top-k, and the top-``pool`` window is
    exact whenever the pool's BM25 floor sits below it. Docs absent
    from ``prior`` are dropped (zero static evidence — densify the
    prior upstream to keep them).

    Scale shape: ONE bounded scalar agg for the normalizer; the
    ``pool``-row candidate set broadcasts into the join, so the
    corpus-sized prior table is never shuffled.
    """
    cand = index.search(query, k=pool, mode=mode, quantize=quantize,
                        use_wand=use_wand)
    mx = prior.agg(F.max(F.col(rank_col)).alias("m")).collect()[0]["m"]
    if mx is None or mx <= 0:
        raise ValueError("static_rank_topk: empty or non-positive prior")
    pnorm = F.col(rank_col).cast("double") / F.lit(float(mx))
    j = (prior.select(F.col(node_col).alias("doc_id"), pnorm.alias("_p"))
         .join(F.broadcast(cand), "doc_id"))
    boosted = _quantize(F.col("score") * F.col("_p"), quantize)
    return (j.select("doc_id", boosted.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def decay_topk(index, meta: DataFrame, query, *, shape: str = "gauss",
               origin: float, scale: float, offset: float = 0.0,
               decay: float = 0.5, field_col: str = "ts", k: int = 10,
               pool: int = 100, mode: str = "OR",
               quantize: int | None = None,
               use_wand: bool = False) -> DataFrame:
    """ES ``function_score`` decay rescoring (gauss | exp | linear) over
    the exact BM25 top-``pool`` window: distance from ``origin`` beyond
    ``offset`` shrinks the score multiplicatively —

        dist   = max(0, |field - origin| - offset)
        gauss  : decay ** ((dist / scale) ** 2)
        exp    : decay ** (dist / scale)
        linear : max(0, 1 - dist * (1 - decay) / scale)

    (algebraically identical to the ES formulas: at dist == scale every
    shape evaluates to ``decay``).  All multipliers are <= 1, so the
    window-exactness argument of ``recency_topk`` holds verbatim; the
    rescoring join broadcasts the pool — the corpus never shuffles.
    ``field_col`` is any numeric column of ``meta`` (epoch seconds,
    meters, price — decay is unit-agnostic, per ES)."""
    if shape not in ("gauss", "exp", "linear"):
        raise ValueError(f"unknown decay shape {shape!r}")
    if scale <= 0 or not 0.0 < decay < 1.0:
        raise ValueError("need scale > 0 and 0 < decay < 1")
    cand = index.search(query, k=pool, mode=mode, quantize=quantize,
                        use_wand=use_wand)
    dist = F.greatest(
        F.abs(F.col(field_col).cast("double") - F.lit(float(origin)))
        - F.lit(float(offset)), F.lit(0.0))
    if shape == "gauss":
        mult = F.pow(F.lit(float(decay)),
                     F.pow(dist / F.lit(float(scale)), F.lit(2.0)))
    elif shape == "exp":
        mult = F.pow(F.lit(float(decay)), dist / F.lit(float(scale)))
    else:
        mult = F.greatest(
            F.lit(1.0) - dist * F.lit((1.0 - float(decay)) / float(scale)),
            F.lit(0.0))
    j = (meta.select("doc_id", mult.alias("_m"))
         .join(F.broadcast(cand), "doc_id"))
    boosted = _quantize(F.col("score") * F.col("_m"), quantize)
    return (j.select("doc_id", boosted.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def field_value_factor_topk(index, meta: DataFrame, query, *,
                            field_col: str, factor: float = 1.0,
                            modifier: str = "none", missing: float = 1.0,
                            k: int = 10, pool: int = 100,
                            mode: str = "OR",
                            quantize: int | None = None,
                            use_wand: bool = False) -> DataFrame:
    """ES ``function_score`` ``field_value_factor``: a stored numeric
    field multiplies the relevance score —

        score * modifier(factor * field)

    with the ES modifiers ``none | log1p | ln1p | sqrt | square |
    reciprocal``. In ES these are DISTINCT: ``log1p`` is the common
    (base-10) log of 1+x, ``ln1p`` the natural log of 1+x — the two
    differ by a constant ln(10) factor (ranking-equal, value-different).
    ``square`` is an explicit x*x — ``pow(x, 2.0)`` is not guaranteed
    bit-equal. Docs with a NULL field take ``missing`` (the ES
    parameter).

    Unlike the decay/recency multipliers this one is NOT bounded by 1,
    so the result is the ES *rescorer* contract (``rescore`` window with
    ``boost_mode: multiply``): exact within the BM25 top-``pool``
    window, which is the standard second-stage pattern — document the
    pool like ES documents ``window_size``. The rescoring join
    broadcasts the pool; the corpus-sized ``meta`` never shuffles."""
    if modifier not in ("none", "log1p", "ln1p", "sqrt", "square",
                        "reciprocal"):
        raise ValueError(f"unknown modifier {modifier!r}")
    cand = index.search(query, k=pool, mode=mode, quantize=quantize,
                        use_wand=use_wand)
    v = F.coalesce(F.col(field_col).cast("double"),
                   F.lit(float(missing))) * F.lit(float(factor))
    if modifier == "log1p":     # ES log1p = log10(1 + x)
        m = F.log(10.0, v + F.lit(1.0))
    elif modifier == "ln1p":    # ES ln1p = ln(1 + x)
        m = F.log1p(v)
    elif modifier == "sqrt":
        m = F.sqrt(v)
    elif modifier == "square":
        m = v * v
    elif modifier == "reciprocal":
        m = F.lit(1.0) / v
    else:
        m = v
    j = (meta.select("doc_id", m.alias("_m"))
         .join(F.broadcast(cand), "doc_id"))
    boosted = _quantize(F.col("score") * F.col("_m"), quantize)
    return (j.select("doc_id", boosted.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))
