"""Interpolated Kneser-Ney trigram language model surprisal.

The canonical web-corpus quality signal: CCNet (Wenzek et al. 2020) and the
LLaMA/RedPajama pipelines filter Common-Crawl pages by the perplexity of a
Kneser-Ney-smoothed n-gram LM (KenLM).  The engine's existing surprisal
operators are maximum-likelihood unigram (``textops.unigram_surprisal_df``)
and conditional bigram (``textops.bigram_surprisal_df``) models; this module
adds the real thing at order 3 — interpolated Kneser-Ney (Chen & Goodman
1998, the formulation KenLM implements) with absolute discounting and
continuation-count lower orders, trained on the corpus itself:

    P(c|ab) = (c(abc) - D3)/c(ab)  +  (D3 * N1+(ab.)/c(ab)) * Pmid(c|b)
    Pmid(c|b) = (N1+(.bc) - D2)/N1+(.b.)
                + (D2 * N1+(b.)/N1+(.b.)) * Plow(c)
    Plow(c) = N1+(.c) / N1+(..)

where N1+ counts DISTINCT continuations/histories over trigram types (the
Kneser-Ney insight: a word's lower-order probability is how many contexts
it completes, not how often it occurs — "francisco" is frequent but only
ever follows "san").  Discounts use the Chen-Goodman estimate
``D = n1/(n1 + 2*n2)`` from the counts-of-counts of each level.  Every
scored trigram occurs in the training corpus (count >= 1 > D), so
probabilities are strictly positive with no max() clamps.

Float determinism (the engine-wide discipline): the model probability for
each trigram type is ONE fixed expression tree over integer counts — both
engines evaluate ``plow`` then ``pmid`` then ``p`` with identical
association — and per-doc contributions fold strictly left-to-right in
ascending (a, b, c) order, matching the DuckDB twin's ordered
``list_reduce``.  Verified hash-exact by the driver (``tx_kn_surprisal``).

Scale shape (10^12 docs):
  * model base = ONE map-combinable hash agg to the trigram-type table
    (corpus-token-scale upper bound, heavily sublinear in practice);
    derived tables shrink monotonically: (a,b) contexts and (b,c)
    continuation types are bigram-type-scale, the b/c marginals are
    vocab-scale (broadcast), discounts and N1+(..) are 1-row.
  * model assembly joins trigram types to (a,b)/(b,c) tables — shuffle
    equi-joins on model-scale tables, AQE handles head-context skew; the
    vocab marginals broadcast.
  * scoring = the reference shuffle-join path (the trigram model can never
    broadcast): per-doc trigram RLE rows equi-join the model table, then
    repartition(doc) + sortWithinPartitions and ONE streaming Arrow
    segmented fold (``textops._segmented_fold`` — rows never move again).

Reference provenance: the reference has no LM (it is a suffix-array search
library); this operator belongs to the training-data-pipeline tier the
survey mandates beyond the reference surface.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .textops import LOWER, UPPER, _segmented_fold, tokens_col


def _discount(df, count_col: str):
    """1-row DataFrame with the Chen-Goodman absolute discount
    ``D = n1 / (n1 + 2*n2)`` over the counts-of-counts of ``count_col``
    (0.5 fallback when the level has no singletons or doubletons — both
    engines guard identically)."""
    return df.agg(
        F.sum(F.when(F.col(count_col) == 1, 1).otherwise(0))
        .cast("long").alias("n1"),
        F.sum(F.when(F.col(count_col) == 2, 1).otherwise(0))
        .cast("long").alias("n2"),
    ).select(
        F.when(F.col("n1") + 2 * F.col("n2") == 0, F.lit(0.5))
        .otherwise(F.col("n1").cast("double")
                   / (F.col("n1") + 2 * F.col("n2")).cast("double")))


def kn3_surprisal_df(df, id_col: str = "doc_id", text_col: str = "text",
                     quantize: int = 4):
    """Per-document mean trigram surprisal under an interpolated
    Kneser-Ney LM trained on the corpus: ``-(1/(ntok-2)) * sum_i
    ln P(w_i | w_{i-2} w_{i-1})``.  Returns (``id_col``, n3, kn_surprisal)
    for docs with >= 3 tokens, n3 = ntok - 2; lower surprisal = more
    LM-fluent text (the CCNet head bucket), higher = word salad / rare
    constructions.  ``exp(kn_surprisal)`` is the doc's per-token
    perplexity under the model.
    """
    toks = F.transform(tokens_col(text_col),
                       lambda x: F.translate(x, UPPER, LOWER))
    base = (df.select(F.col(id_col), toks.alias("toks"))
            .filter(F.size("toks") >= 3))
    # per-doc sorted trigram structs -> RLE -> explode the run INDEX
    # (cheap scalar; deriving fields per emitted row keeps GenerateExec
    # from re-evaluating the struct-array transform per element)
    rle = base.select(
        F.col(id_col), (F.size("toks") - 2).alias("n3"),
        F.expr("array_sort(transform(sequence(1, size(toks) - 2), "
               "i -> struct(toks[i - 1] AS a, toks[i] AS b, "
               "toks[i + 1] AS c)))").alias("sg")
    ).select(
        id_col, "n3", "sg",
        F.expr("filter(sequence(1, size(sg)), i -> i = 1 OR "
               "element_at(sg, i) != element_at(sg, i - 1))")
        .alias("starts"))
    pairs = rle.select(
        id_col, "n3", "sg", "starts",
        F.explode(F.expr("sequence(1, size(starts))")).alias("j")
    ).select(
        id_col, "n3",
        F.expr("element_at(sg, element_at(starts, j)).a").alias("a"),
        F.expr("element_at(sg, element_at(starts, j)).b").alias("b"),
        F.expr("element_at(sg, element_at(starts, j)).c").alias("c"),
        F.expr("(CASE WHEN j < size(starts) THEN element_at(starts, j + 1)"
               " ELSE size(sg) + 1 END) - element_at(starts, j)")
        .alias("tf"))

    # ---- model tables (all derive from the ONE trigram-type table) ----
    c3 = (pairs.groupBy("a", "b", "c").agg(F.sum("tf").alias("n3c"))
          .localCheckpoint(eager=True))
    # (a,b) contexts: raw context count + distinct-continuation count
    ctx = c3.groupBy("a", "b").agg(F.sum("n3c").alias("c2"),
                                   F.count("*").alias("n1ab"))
    # (b,c) continuation types: N1+(.bc)  (checkpointed — feeds 4 branches)
    ncbc = (c3.groupBy("b", "c").agg(F.count("*").alias("cbc"))
            .localCheckpoint(eager=True))
    # b marginals: N1+(.b.) = sum, N1+(b.) = distinct c  (vocab-scale)
    nb = ncbc.groupBy("b").agg(F.sum("cbc").alias("nbdot"),
                               F.count("*").alias("n1b"))
    # c marginal: N1+(.c)  (vocab-scale); N1+(..) = 1 row
    ncc = ncbc.groupBy("c").agg(F.count("*").alias("cc"))
    t2 = ncbc.agg(F.count("*").cast("double").alias("t2"))
    dd3 = _discount(c3, "n3c").toDF("d3")
    dd2 = _discount(ncbc, "cbc").toDF("d2")

    # plow -> pmid -> p as three chained projections: ONE fixed float
    # expression tree, association identical to the DuckDB twin's CTEs
    mlow = (ncc.crossJoin(F.broadcast(t2))
            .select("c", (F.col("cc").cast("double") / F.col("t2"))
                    .alias("plow")))
    mmid = (ncbc.join(F.broadcast(nb), "b")
            .join(F.broadcast(mlow), "c")
            .crossJoin(F.broadcast(dd2))
            .select(
                "b", "c",
                ((F.col("cbc").cast("double") - F.col("d2"))
                 / F.col("nbdot").cast("double")
                 + ((F.col("d2") * F.col("n1b").cast("double"))
                    / F.col("nbdot").cast("double")) * F.col("plow"))
                .alias("pmid")))
    model = (c3.join(ctx, ["a", "b"])
             .join(mmid, ["b", "c"])
             .crossJoin(F.broadcast(dd3))
             .select(
                 "a", "b", "c",
                 ((F.col("n3c").cast("double") - F.col("d3"))
                  / F.col("c2").cast("double")
                  + ((F.col("d3") * F.col("n1ab").cast("double"))
                     / F.col("c2").cast("double")) * F.col("pmid"))
                 .alias("p")))

    # ---- scoring: shuffle join + exact segmented fold ----
    s = F.col("tf").cast("double") * -F.log(F.col("p"))
    scored = (pairs.join(model, ["a", "b", "c"])
              .select(id_col, "n3", "a", "b", "c", s.alias("s"))
              .repartition(F.col(id_col))
              .sortWithinPartitions(id_col, "a", "b", "c")
              .select(id_col, F.col("n3").alias("ntok"), "s"))
    mul = float(10 ** quantize)
    return scored.mapInPandas(
        _segmented_fold(id_col, "ntok", "n3", "kn_surprisal", mul),
        f"{id_col} long, n3 long, kn_surprisal double")
