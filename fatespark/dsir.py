"""DSIR-style importance weights for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The published recipe: represent each document as a bag of hashed n-grams
(unigrams + bigrams hashed into ``m`` buckets), fit two smoothed bucket
multinomials — ``p_target`` over a small high-quality target set and
``p_raw`` over the raw pool — and score every raw document with

    log w(doc) = sum_f  c_f(doc) * ( ln p_target[f] - ln p_raw[f] )

then sample the pool proportionally to ``w``. High-weight docs "look like
the target" under the hashed-ngram model.

Engine discipline (same as ``textops.unigram_surprisal_df``):

- The bucket hash is the KMV primitive (first 60 bits of
  ``md5(seed ':' gram)`` mod ``m``, JVM-side) so the DuckDB twin
  (``sqlhash.md5_bucket60``) reproduces every bucket id bit-exactly.
- Per-doc float contributions fold in ascending-bucket order with a
  strict left-to-right ``aggregate`` — engine-reproducible doubles.
- Smoothing is add-one over integer counts: ``p[f] = (c_f + 1)/(T + m)``
  — both sides compute the same exact doubles from the same exact ints.

Scale shape (the first cut of this operator shuffled ~2 x n_grams
(doc, bucket, count) rows and folded a corpus-sized collect_list — 106 s
at 200k pages; this plan is 9 s, bit-identical):

  1. model pass: grams -> buckets INSIDE the per-doc array (narrow md5
     transform), one explode into a single m-bounded hash aggregate
     (count(*) + count_if(target) together) — the only shuffle, m rows
     out, map-side combined.
  2. the m-row log-ratio table is computed by Spark (so ln() is
     java.lang.Math.log on both the table and any fallback path) and
     inlined into the scoring plan as a LITERAL lookup array — m is an
     operator constant (default 4096), never corpus-dependent, so this
     is a bounded plan literal, not a corpus collect.
  3. scoring pass: per-doc run-length encoding over the SORTED bucket
     array (the surprisal RLE), then one narrow ``aggregate`` fold
     ``acc + c * arr[b]`` in ascending-bucket order. Zero shuffles,
     zero corpus-sized state; output is (doc, n_grams, logw) rows.

At web scale both passes stream the corpus once each; nothing
corpus-sized is persisted, sorted globally, or collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textops import LOWER, UPPER, tokens_col


def _bucket_expr(g: Column, m: int, seed: str) -> Column:
    """md5-60bit bucket of a gram (the KMV primitive, twin:
    ``sqlhash.md5_bucket60``) — usable inside array lambdas."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(seed), g)),
                           1, 15), 16, 10).cast("long"),
        F.lit(m))


def dsir_logweights(df: DataFrame, target, id_col: str = "doc_id",
                    text_col: str = "text", *, m: int = 4096,
                    seed: str = "dsir", quantize: int = 4,
                    broadcast_model: bool | None = None) -> DataFrame:
    """Per-doc DSIR log importance weight of every doc in ``df`` toward
    the subset selected by ``target`` (a boolean Column over ``df``'s
    rows — e.g. ``F.col('lang') == 'en'`` "make everything look like the
    English slice", or a curated-source flag). Returns
    (id_col, n_grams, logw) for docs with >= 1 token; logw is
    floor-quantized to ``quantize`` decimals. Raw (unnormalized) sum per
    the paper — longer docs move further from 0 by construction.

    ``broadcast_model`` picks the scoring-pass model transport. False
    (the default below ``m`` = 65536): the m-row log-ratio table inlines
    as a LITERAL lookup array and scoring is a zero-shuffle JVM
    ``aggregate`` fold — right for the paper's m = 1e4-ish. True (auto
    past 65536): the plan-literal would bloat at m >= ~1e5-1e6, so the
    SAME m-row table instead rides a broadcast hash join against the
    per-doc RLE rows (still narrow — no wide shuffle anywhere) and the
    fold runs in the transposed-vectorized Arrow kernel
    (``textops._segmented_fold``, normalize=False). Bit-identical logw:
    both paths multiply/add the same java-double log-ratios in the same
    ascending-bucket order (tested at m=4096 both ways)."""
    spark = df.sparkSession
    toks = F.transform(tokens_col(text_col),
                       lambda x: F.translate(x, UPPER, LOWER))
    base = (df.select(F.col(id_col),
                      F.coalesce(target.cast("boolean"),
                                 F.lit(False)).alias("_tgt"),
                      toks.alias("toks"))
            .filter(F.size("toks") >= 1))
    grams = F.expr(
        "concat(toks, CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(toks[i - 1], ' ', toks[i])) "
        "ELSE array() END)")
    # -- model pass: ONE m-bounded aggregate ------------------------------
    # hash AFTER the explode, never explode(transform(..., md5)): Generate
    # re-evaluates the generator child per EMITTED element, so exploding a
    # transform-built array makes the per-element md5 O(len^2) per doc —
    # measured 113 s vs 4.5 s at 200k pages for this exact stage
    model = (base.select("_tgt", F.explode(grams).alias("g"))
             .select("_tgt", _bucket_expr(F.col("g"), m, seed).alias("b"))
             .groupBy("b")
             .agg(F.count("*").alias("cr"),
                  F.count_if(F.col("_tgt")).alias("ct")))
    tots = model.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    md = float(m)
    logr = (F.log((F.col("ct") + 1).cast("double")
                  / (F.col("tt").cast("double") + F.lit(md)))
            - F.log((F.col("cr") + 1).cast("double")
                    / (F.col("tr").cast("double") + F.lit(md))))
    if broadcast_model is None:
        broadcast_model = m > 65536
    mul = float(10 ** quantize)

    # -- scoring pass: narrow RLE + ordered fold, zero wide shuffles -------
    # here the bucket array IS built per doc (transform, evaluated once
    # per row — no explode over it, so no Generate re-evaluation)
    withb = base.select(
        id_col,
        F.transform(grams,
                    lambda g: _bucket_expr(g, m, seed)).alias("barr"))
    rle = withb.select(
        F.col(id_col), F.size("barr").alias("n_grams"),
        F.array_sort("barr").alias("sb")
    ).select(
        id_col, "n_grams", "sb",
        F.expr("filter(sequence(1, size(sb)), i -> i = 1 OR "
               "element_at(sb, i) != element_at(sb, i - 1))")
        .alias("starts"))

    if broadcast_model:
        # m-row table, checkpointed so the model aggregate runs once,
        # broadcast into the scoring plan instead of inlined as literals
        logr_df = (model.crossJoin(F.broadcast(tots))
                   .select("b", logr.alias("logr"))
                   .localCheckpoint(eager=True))
        from .textops import _segmented_fold
        # explode the run INDEX (Generate-safe), derive (b, c) on the
        # emitted row; Generate emits in array order so each doc's rows
        # stay contiguous and bucket-ascending through the broadcast join
        prows = rle.select(
            id_col, "n_grams", "sb", "starts",
            F.explode(F.expr("sequence(1, size(starts))")).alias("j")
        ).select(
            id_col, "n_grams",
            F.expr("element_at(sb, element_at(starts, j))").alias("b"),
            F.expr("(CASE WHEN j < size(starts) THEN "
                   "element_at(starts, j + 1) ELSE size(sb) + 1 END)"
                   " - element_at(starts, j)").alias("c"))
        scored = (prows.join(F.broadcast(logr_df), "b")
                  .select(id_col, "n_grams",
                          (F.col("c").cast("double") * F.col("logr"))
                          .alias("s")))
        return scored.mapInPandas(
            _segmented_fold(id_col, "n_grams", "n_grams", "logw", mul,
                            normalize=False),
            f"{id_col} long, n_grams long, logw double")

    rows = (model.crossJoin(F.broadcast(tots))
            .select("b", logr.alias("logr")).collect())  # <= m rows
    arr = [0.0] * m
    for r in rows:
        arr[int(r["b"])] = float(r["logr"])
    # literal lookup array: Spark computed every double (java Math.log),
    # F.lit round-trips them bit-exactly into the scoring plan
    logr_lit = F.array(*[F.lit(x) for x in arr])
    pairs = F.expr(
        "transform(sequence(1, size(starts)), j -> struct("
        " element_at(sb, element_at(starts, j)) AS b,"
        " (CASE WHEN j < size(starts) THEN element_at(starts, j + 1)"
        "  ELSE size(sb) + 1 END) - element_at(starts, j) AS c))")
    fold = F.aggregate(
        pairs, F.lit(0.0).cast("double"),
        lambda acc, p: acc + (p["c"].cast("double")
                              * F.element_at(logr_lit,
                                             p["b"].cast("int") + 1)))
    return rle.select(id_col, "n_grams",
                      (F.floor(fold * mul) / mul).alias("logw"))


def hashed_ngram_counts(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", *, m: int = 4096,
                        seed: str = "dsir",
                        carry: tuple = ()) -> DataFrame:
    """(id_col, *carry, b, c): per-doc hashed unigram+bigram bucket
    counts as ROWS (the generic feature extraction — e.g. to train a
    downstream classifier). ``carry`` columns (constant per doc) ride
    through. The scoring path above deliberately does NOT use this: it
    keeps the pairs inside per-doc arrays to avoid the corpus-sized
    shuffle."""
    toks = F.transform(tokens_col(text_col),
                       lambda x: F.translate(x, UPPER, LOWER))
    base = (df.select(F.col(id_col), *[F.col(c) for c in carry],
                      toks.alias("toks"))
            .filter(F.size("toks") >= 1))
    grams = F.expr(
        "concat(toks, CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(toks[i - 1], ' ', toks[i])) "
        "ELSE array() END)")
    g = base.select(id_col, *carry, F.explode(grams).alias("g"))
    return (g.select(id_col, *carry,
                     _bucket_expr(F.col("g"), m, seed).alias("b"))
            .groupBy(id_col, *carry, "b").agg(F.count("*").alias("c")))
