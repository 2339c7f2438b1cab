"""Linear (fasttext-style) quality classifier over hashed token features.

The model-based quality filter every production pipeline runs (CCNet's
fasttext language/quality models, RefinedWeb/FineWeb's quality
classifiers): score = bias + mean over tokens of w[h(token) mod m], where
``w`` is an m-bucket weight vector and ``h`` the md5-u64 token hash the
dedup tier already uses (``dedup.token_hash_u64``). Documents with
logit >= threshold are kept.

The SCORING PLUMBING here is the real, scale-shaped thing — hashed
features, bounded m-entry weight table broadcast to every Arrow batch
(a closure capture here; a broadcast variable on a cluster), md5 once
per unique token per batch, position-ordered left-fold so the float64
sum is bit-reproducible in the DuckDB twin, zero shuffles. The WEIGHTS
shipped by ``pseudo_weights`` are a
deterministic splitmix64 stand-in for trained parameters (no training
corpus exists in this environment); a real fasttext/logreg model drops in
as a plain float array without touching the plan.

Why logit, not probability, in the hash-checked output: the sigmoid is
monotone (thresholding is identical either way) and ``exp`` is the one
spot where JVM and libm may differ by 1 ulp — the logit is pure
literal-weight sums and one division, bit-exact across engines.
``sigmoid_col`` is provided for consumers who want probabilities.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .corpus import splitmix64


def pseudo_weights(m: int = 256, seed: int = 77) -> np.ndarray:
    """Deterministic stand-in weights in [-1, 1): splitmix64 of the bucket
    index, top 53 bits to a uniform double — same derivation family as
    the ANN hyperplanes, reproducible everywhere from the seed alone."""
    with np.errstate(over="ignore"):   # u64 wraparound is the derivation
        idx = np.arange(m, dtype=np.uint64) + np.uint64(seed) * np.uint64(
            0x9E3779B97F4A7C15)
        return (splitmix64(idx) >> np.uint64(11)).astype(np.float64) \
            / float(1 << 53) * 2.0 - 1.0


def _bucket_col(tok, m: int):
    # md5-u64 (big-endian first 8 bytes) mod m, all JVM-side: conv() of
    # the 16-hex-char prefix is an unsigned decimal string; decimal(20,0)
    # holds the full u64 range exactly
    h = F.conv(F.substring(F.md5(tok), 1, 16), 16, 10).cast("decimal(20,0)")
    return (h % m).cast("int")


def quality_logit_df(df: DataFrame, weights, bias: float = 0.0,
                     *, text_col: str = "text", id_col: str = "doc_id",
                     threshold: float = 0.0) -> DataFrame:
    """(id, n_toks, logit, keep): logit = bias + mean of w[h(tok) mod m]
    over ASCII-folded whitespace tokens in POSITION order (empty docs
    score exactly ``bias``); keep = logit >= threshold.

    The md5 token hash runs once per UNIQUE token per Arrow batch
    (``dedup._batch_token_hashes``), not per occurrence — on a Zipfian
    corpus that is a ~20x cut in hash calls vs the earlier per-occurrence
    JVM expression. The per-doc sum is the TRANSPOSED strict left fold
    (one vectorized add per fold step across the batch's docs, longest
    first — the ``textops._segmented_fold`` pattern), so the float64
    association is bit-identical to the sequential fold the DuckDB twin's
    ``list_reduce`` runs; a ``reduceat`` pairwise sum would not be. Bias
    addition, the mean division, round(6) and the keep comparison stay
    JVM-side so their rounding semantics are unchanged."""
    w_np = np.asarray([float(v) for v in weights], dtype=np.float64)
    m = len(w_np)
    bias_f = float(bias)

    def score(batches):
        from .dedup import _batch_token_hashes
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            th, lens = _batch_token_hashes(pdf[text_col])
            contrib = w_np[(th % np.uint64(m)).astype(np.int64)]
            nseg = len(lens)
            starts = np.zeros(nseg, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            order = np.argsort(-lens, kind="stable")
            st_o = starts[order]
            neg_len = -lens[order]
            acc_o = np.zeros(nseg, dtype=np.float64)
            maxlen = int(lens.max()) if nseg else 0
            for i in range(maxlen):
                # mact = #docs still active at fold step i (length > i)
                mact = int(np.searchsorted(neg_len, -(i + 1), side="right"))
                acc_o[:mact] += contrib[st_o[:mact] + i]
            accs = np.empty(nseg, dtype=np.float64)
            accs[order] = acc_o
            mean = np.where(lens > 0, accs / np.maximum(lens, 1), 0.0)
            yield pd.DataFrame({id_col: pd.array(ids, dtype="int64"),
                                "n_toks": pd.array(lens, dtype="int64"),
                                "mean": pd.array(mean, dtype="float64")})

    scored = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        score, schema=f"{id_col} long, n_toks long, mean double")
    logit = F.lit(bias_f) + F.col("mean")
    return scored.select(
        F.col(id_col),
        F.col("n_toks"),
        F.round(logit, 6).alias("logit"),
        (F.round(logit, 6) >= float(threshold)).alias("keep"))


def sigmoid_col(logit):
    """P(keep) — monotone in the logit; not used in hash-checked rows
    (exp may differ by 1 ulp across engines)."""
    return 1.0 / (1.0 + F.exp(-logit))


def quality_logit_sql(weights, bias: float = 0.0, *, threshold: float = 0.0,
                      src: str = "documents") -> str:
    """DuckDB twin: same weights as literals, same md5-u64 bucket, same
    position-ordered left fold (list_reduce over a 0.0-prepended list),
    same mean-then-bias association."""
    from . import sqlhash as sq
    w = [float(v) for v in weights]
    m = len(w)
    # explicit ::DOUBLE — bare decimal literals would make the list (and
    # the fold) DECIMAL(19,18), which both rounds differently and
    # overflows once a doc's sum passes 10
    lits = ", ".join(f"{v!r}::DOUBLE" for v in w)
    bucket = f"({sq.md5_u64('t')} % {m})::INT"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(
           list_filter(regexp_split_to_array(coalesce(text, ''),
                                             '[ \\t\\n\\r\\f\\v]+'),
                       x -> x <> ''),
           x -> translate(x,
                'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'))
         AS ts
  FROM {src}
),
scored AS (
  SELECT doc_id, len(ts) AS n_toks,
         {float(bias)!r} + CASE WHEN len(ts) > 0 THEN
           list_reduce(list_prepend(0.0, list_transform(ts,
             t -> [{lits}][{bucket} + 1])), (acc, v) -> acc + v)
           / CAST(len(ts) AS DOUBLE)
         ELSE 0.0 END AS logit
  FROM toks
)
SELECT doc_id, n_toks, round(logit, 6) AS logit,
       round(logit, 6) >= {float(threshold)!r} AS keep
FROM scored ORDER BY doc_id"""
