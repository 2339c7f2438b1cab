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
- Per-doc float contributions fold in ascending-bucket order with a strict
  left-to-right ``aggregate`` — engine-reproducible doubles. The fold runs
  over ``collect_list(struct(b, s))`` which is SAFE here, unlike the
  retired r2 surprisal shape: per-doc cardinality is capped at
  ``min(n_grams, m)`` structs (m defaults to 4096), not vocabulary-sized.
- Smoothing is add-one over integer counts: ``p[f] = (c_f + 1)/(T + m)``
  — both sides compute the same exact doubles from the same exact ints.

Scale shape: one map-combinable shuffle to (doc, bucket) counts; the two
model tables are m-sized aggregates of it; the m-row log-ratio table
broadcasts; scoring is a broadcast join + per-doc fold. Nothing
corpus-sized is persisted, sorted globally, or collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sketch import kmv_hash_col
from .textops import LOWER, UPPER, tokens_col


def hashed_ngram_counts(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", *, m: int = 4096,
                        seed: str = "dsir",
                        carry: tuple = ()) -> DataFrame:
    """(id_col, *carry, b, c): per-doc hashed unigram+bigram bucket counts.
    ``carry`` columns (constant per doc, e.g. a target flag) ride through
    the aggregation. Docs with zero tokens produce no rows."""
    toks = F.transform(tokens_col(text_col),
                       lambda x: F.translate(x, UPPER, LOWER))
    base = (df.select(F.col(id_col), *[F.col(c) for c in carry],
                      toks.alias("toks"))
            .filter(F.size("toks") >= 1))
    # unigrams ++ bigrams; the CASE guards Spark's descending
    # sequence(1, 0) when a doc has a single token
    grams = F.expr(
        "concat(toks, CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(toks[i - 1], ' ', toks[i])) "
        "ELSE array() END)")
    g = base.select(id_col, *carry, F.explode(grams).alias("g"))
    return (g.select(id_col, *carry,
                     F.pmod(kmv_hash_col("g", seed), F.lit(m)).alias("b"))
            .groupBy(id_col, *carry, "b").agg(F.count("*").alias("c")))


def dsir_logweights(df: DataFrame, target, id_col: str = "doc_id",
                    text_col: str = "text", *, m: int = 4096,
                    seed: str = "dsir", quantize: int = 4) -> DataFrame:
    """Per-doc DSIR log importance weight of every doc in ``df`` toward
    the subset selected by ``target`` (a boolean Column over ``df``'s
    rows — e.g. ``F.col('lang') == 'en'`` "make everything look like the
    English slice", or a curated-source flag). Returns
    (id_col, n_grams, logw) for docs with >= 1 token; logw is
    floor-quantized to ``quantize`` decimals. Raw (unnormalized) sum per
    the paper — longer docs move further from 0 by construction."""
    cnts = hashed_ngram_counts(
        df.withColumn("_tgt", target.cast("boolean")),
        id_col, text_col, m=m, seed=seed, carry=("_tgt",))

    # model tables: m rows each, exact integer counts
    raw = cnts.groupBy("b").agg(F.sum("c").alias("cr"))
    tgt = (cnts.filter(F.col("_tgt")).groupBy("b")
           .agg(F.sum("c").alias("ct")))
    model = (raw.join(tgt, "b", "left")
             .select("b", "cr", F.coalesce("ct", F.lit(0)).alias("ct")))
    tots = model.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    md = float(m)
    logr = (F.log((F.col("ct") + 1).cast("double")
                  / (F.col("tt").cast("double") + F.lit(md)))
            - F.log((F.col("cr") + 1).cast("double")
                    / (F.col("tr").cast("double") + F.lit(md))))
    ratio = (model.crossJoin(F.broadcast(tots))
             .select("b", logr.alias("logr"))
             .localCheckpoint(eager=True))  # m rows; computed once

    mul = float(10 ** quantize)
    scored = (cnts.join(F.broadcast(ratio), "b")
              .select(id_col, "c",
                      F.struct(F.col("b"),
                               (F.col("c").cast("double")
                                * F.col("logr")).alias("s")).alias("p")))
    return (scored.groupBy(id_col)
            .agg(F.sum("c").alias("n_grams"),
                 F.collect_list("p").alias("ps"))
            .select(
                id_col, "n_grams",
                (F.floor(F.expr(
                    "aggregate(sort_array(ps), cast(0.0 as double), "
                    "(acc, x) -> acc + x.s)") * mul) / mul).alias("logw")))
