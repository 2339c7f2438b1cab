"""KMV (k-minimum-values) distinct-count sketch — deterministic and
oracle-replicable.

The cardinality sketch a 100 TB pipeline wants for "distinct urls per
domain / distinct shingles per shard" style questions without a full
count(DISTINCT) shuffle of the values: hash every value to a uniform
60-bit point, keep only the k smallest hashes per group, and estimate
|distinct| from how densely the minima pack the hash space
(Bar-Yossef et al. 2002): ``est = (k-1) * SPACE / h_(k)``. Groups with
fewer than k distinct hashes report the exact count (the sketch IS the
distinct set there).

Why KMV and not HyperLogLog here: the estimator consumes ONE scalar (the
k-th minimum) instead of a 2^p-register harmonic mean, so the whole
estimate is a single deterministic float expression — bit-replicable by
the DuckDB oracle with no float-summation-order caveats — and the state
(the k minima) is trivially mergeable: union the sets, keep the k
smallest (``kmv_merge_states``), which is how shard-level sketches
combine on a tree without touching rows again.

Hashing is the engine's md5-60bit primitive (``sampling.bucket_col``'s
space, SQL twin ``sqlhash.md5_bucket60`` with the identity modulus), so
estimates are independent of partitioning, engine, and row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SPACE = 1 << 60

__all__ = ["kmv_hash_col", "kmv_distinct_df", "kmv_state_df",
           "kmv_merge_states", "bloom_positions", "bloom_build",
           "bloom_probe", "cms_cell_col", "cms_build", "cms_query",
           "hll_rho_col", "hll_state_df", "hll_merge_states", "hll_alpha",
           "hll_estimate_df", "hll_distinct_df"]


def kmv_hash_col(value_col: str | Column, seed: str = "kmv") -> Column:
    """Uniform 60-bit hash point of the value (JVM md5/conv, no Python)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(seed), v.cast("string"))), 1, 15), 16, 10).cast("long")


def kmv_distinct_df(df: DataFrame, group_col: str, value_col: str,
                    k: int = 256, seed: str = "kmv") -> DataFrame:
    """(``group_col``, n_kept, est_distinct): estimated distinct
    ``value_col`` per group. ``n_kept`` = min(k, distinct hashes) — when
    it is < k the estimate is exact by construction.

    Scale shape: one (group, hash) distinct aggregation, then a window
    rank that only ever ranks up to k rows per group after the partial
    top-k pushes down; the estimator itself is a scalar expression.
    """
    hashes = (df.select(F.col(group_col).alias("g"),
                        kmv_hash_col(value_col, seed).alias("h"))
              .distinct())
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    ranked = (hashes.withColumn("r", F.row_number().over(w))
              .filter(F.col("r") <= k))
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.floor(F.lit(float((k - 1) * _SPACE))
                        / F.col("kth").cast("double")).cast("double"))
    return (ranked.groupBy("g")
            .agg(F.count("*").alias("n_kept"),
                 F.max(F.when(F.col("r") == k, F.col("h"))).alias("kth"))
            .select(F.col("g").alias(group_col), "n_kept",
                    est.cast("long").alias("est_distinct"))
            .orderBy(group_col))


def kmv_state_df(df: DataFrame, group_col: str, value_col: str,
                 k: int = 256, seed: str = "kmv") -> DataFrame:
    """(``group_col``, minima: array<long>) — the mergeable sketch state
    (the k smallest distinct hash points per group, ascending)."""
    hashes = (df.select(F.col(group_col).alias("g"),
                        kmv_hash_col(value_col, seed).alias("h"))
              .distinct())
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    return (hashes.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .groupBy("g")
            .agg(F.sort_array(F.collect_list("h")).alias("minima"))
            .select(F.col("g").alias(group_col), "minima"))


def kmv_merge_states(a: DataFrame, b: DataFrame, group_col: str,
                     k: int = 256) -> DataFrame:
    """Union two sketch states: per group, distinct-union the minima and
    keep the k smallest — the tree-combine step for shard-level sketches.
    Estimating from the merged state equals sketching the unioned rows."""
    both = a.unionByName(b)
    return (both.select(group_col, F.explode("minima").alias("h"))
            .distinct()
            .withColumn("r", F.row_number().over(
                Window.partitionBy(group_col).orderBy(F.asc("h"))))
            .filter(F.col("r") <= k)
            .groupBy(group_col)
            .agg(F.sort_array(F.collect_list("h")).alias("minima")))


# ---------------------------------------------------------------------------
# Bloom-filter seen-set (crawl-frontier membership)
# ---------------------------------------------------------------------------
#
# "Have we already crawled this URL" at 10^12 scale: a sparse distributed
# Bloom filter. k positions per value from the same md5-60bit primitive
# (pos_i = md5('{seed}{i}:' || value) % m_bits), packed 32 bits per word so
# every mask is a small positive BIGINT on both engines (no sign-bit edge
# at 1<<63). Build is ONE map-combinable bit_or aggregate keyed by word
# index; absent words are simply missing rows (sparse — a barely-loaded
# filter costs rows proportional to set bits, not to m_bits). Probing is a
# broadcast-or-shuffle equi-join on word index + a bool_and over the k
# probes. No false negatives by construction; false-positive rate is the
# standard (1 - e^{-kn/m})^k. Deterministic: same values -> bit-identical
# word table on any engine, partitioning, or row order.

def bloom_positions(value_col: str | Column, m_bits: int, k: int,
                    seed: str = "bloom") -> Column:
    """Array of the k bit positions of a value (each
    ``md5('{seed}{i}:' || value) % m_bits``)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.array(*[
        F.pmod(kmv_hash_col(v, f"{seed}{i}"), F.lit(m_bits))
        for i in range(k)])


# derive (word_idx, mask) from a named bit-position column — 32-bit word
# packing, so the mask stays a small positive BIGINT on every engine
_WORD = "CAST(floor(pos / 32) AS BIGINT)"
_MASK = "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 32) AS INT))"


def _hash_fan(df: DataFrame, value_col: str, k: int, seed: str,
              modulus: int, keep: tuple = ()) -> DataFrame:
    """(*keep, i, pos): one row per (value row, hash function i) with
    ``pos = md5('{seed}{i}:' || value) % modulus``. The hash runs AFTER
    the explode of the (cheap, literal) index array — exploding an array
    of k md5 expressions makes GenerateExec re-evaluate all k hashes per
    emitted element, k^2 md5 calls per value (the dsir.py lesson)."""
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.concat(F.lit(seed), F.col("i").cast("string")),
        F.col(value_col).cast("string"))), 1, 15), 16, 10).cast("long")
    cols = list(dict.fromkeys((*keep, value_col)))
    return (df.select(*[F.col(c) for c in cols],
                      F.explode(F.array(
                          *[F.lit(i) for i in range(k)])).alias("i"))
            .select(*keep, "i", F.pmod(h, F.lit(modulus)).alias("pos")))


def bloom_build(df: DataFrame, value_col: str, *, m_bits: int = 1 << 16,
                k: int = 4, seed: str = "bloom") -> DataFrame:
    """Sparse Bloom filter (word_idx, word) over ``value_col``."""
    rows = (_hash_fan(df, value_col, k, seed, m_bits)
            .select(F.expr(_WORD).alias("word_idx"),
                    F.expr(_MASK).alias("mask")))
    return (rows.groupBy("word_idx").agg(F.bit_or("mask").alias("word")))


def bloom_probe(bloom: DataFrame, probes: DataFrame, value_col: str, *,
                m_bits: int = 1 << 16, k: int = 4,
                seed: str = "bloom") -> DataFrame:
    """(value_col, member): Bloom membership per probe row. ``member`` is
    true iff all k bits are set — never false for an inserted value. The
    join keys on word_idx; Spark broadcasts whichever side is small (the
    filter for lookups, the probe batch for frontier diffing)."""
    px = (_hash_fan(probes, value_col, k, seed, m_bits,
                    keep=(value_col,))
          .select(value_col, F.expr(_WORD).alias("word_idx"),
                  F.expr(_MASK).alias("mask")))
    j = px.join(bloom, "word_idx", "left")
    # a missing word row means no bits set there -> not a member
    hit = (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask"))
           == F.col("mask"))
    return (j.select(value_col, hit.alias("h"))
            .groupBy(value_col).agg(F.bool_and("h").alias("member")))


# ---------------------------------------------------------------------------
# Count-min sketch (heavy-hitter frequency estimation)
# ---------------------------------------------------------------------------
#
# "How often does this term/url/domain occur" at 10^12 rows without a
# full count shuffle of the keys: d independent hash rows of width w;
# every occurrence increments cell (j, h_j(x)); a point query reads the
# MINIMUM of its d cells — an overestimate, never an underestimate, with
# err <= 2N/w at >= 1 - (1/2)^d probability (Cormode & Muthukrishnan
# 2005). Hashing is the md5-60bit primitive again, so estimates are
# engine/partitioning/row-order independent and the DuckDB twin is
# bit-exact. The table is built by ONE map-combinable sum aggregate on
# (row, cell) — d*w bounded rows out, mergeable across shards by cell sum.

def cms_cell_col(value_col: str | Column, j: int, width: int,
                 seed: str = "cms") -> Column:
    """Cell index of a value in hash row ``j``."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.pmod(kmv_hash_col(v, f"{seed}{j}"), F.lit(width))


def cms_build(df: DataFrame, value_col: str, *, depth: int = 4,
              width: int = 1 << 14, seed: str = "cms",
              weight_col: str | None = None) -> DataFrame:
    """(j, cell, n): sparse count-min table over ``value_col`` occurrences
    (or ``weight_col`` sums). Merge shards by summing matching cells."""
    keep = (weight_col,) if weight_col else ()
    fan = _hash_fan(df, value_col, depth, seed, width, keep=keep)
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    rows = fan.select(F.col("i").alias("j"), F.col("pos").alias("cell"),
                      w.alias("n"))
    return rows.groupBy("j", "cell").agg(F.sum("n").alias("n"))


def cms_query(cms: DataFrame, probes: DataFrame, value_col: str, *,
              depth: int = 4, width: int = 1 << 14,
              seed: str = "cms") -> DataFrame:
    """(value_col, est): point-frequency estimate per probe row — the min
    over the d cells, 0 if any cell row is absent (sparse table). Join
    keys on (j, cell); Spark broadcasts the small side."""
    px = (_hash_fan(probes, value_col, depth, seed, width,
                    keep=(value_col,))
          .select(value_col, F.col("i").alias("j"),
                  F.col("pos").alias("cell")))
    j = px.join(cms, ["j", "cell"], "left")
    return (j.groupBy(value_col)
            .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est")))


# ---------------------------------------------------------------------------
# HyperLogLog — the constant-size cardinality sketch (Flajolet et al. 2007)
# ---------------------------------------------------------------------------
# Complements KMV: the state is 2^p registers REGARDLESS of cardinality
# (KMV's k minima answer the same question but its relative error ~1.3/sqrt(k)
# costs k=256 longs for ~8%; HLL p=12 gets ~1.6% in 4096 max-rho bytes), and
# register-wise max-merge is the industry shard-combine contract. The
# float-summation-order caveat that picked KMV originally is solved here, not
# dodged: every indicator term is the EXACT dyadic 1.0/(1<<rho) (never libm
# pow), the harmonic sum folds in ASCENDING BUCKET ORDER on both engines
# (sort_array+aggregate vs ORDER BY+list_reduce — IEEE adds in the same order
# give the same bits), alpha_m is one Python-computed literal embedded in
# both plans, and the only libm call (ln, linear-counting branch) is fenced
# by the round(6) cross-libm insurance the repo uses for exp/log everywhere.
#
# rho (leading-zeros+1 of the suffix) is computed with integer/string ops
# shared bit-for-bit by Spark and DuckDB: instr(lpad(bin(suffix)), '1').


def hll_rho_col(value_col: str | Column, p: int = 12,
                seed: str = "hll") -> tuple[Column, Column]:
    """(bucket, rho) of a value under the md5-60bit hash: bucket = top p
    bits, rho = 1-based position of the first 1-bit in the remaining
    60-p bits (61-p when they are all zero). 7 <= p <= 16 so the dyadic
    indicator 1/2^rho stays exact in float64 (rho <= 54 <= 2^63 shifts)."""
    if not 7 <= p <= 16:
        raise ValueError(f"p must be in [7, 16], got {p}")
    h = kmv_hash_col(value_col, seed)
    w = 60 - p
    bucket = F.shiftright(h, w)
    suffix = h.bitwiseAND(F.lit((1 << w) - 1).cast("long"))
    pos = F.instr(F.lpad(F.bin(suffix), w, "0"), "1")
    rho = F.when(pos == 0, F.lit(w + 1)).otherwise(pos)
    return bucket.cast("int"), rho.cast("int")


def hll_state_df(df: DataFrame, group_col: str, value_col: str,
                 p: int = 12, seed: str = "hll") -> DataFrame:
    """(g, bucket, rho): the register table — max rho per (group, bucket).
    ONE map-side-combinable agg; state is bounded by |groups| * 2^p rows
    no matter the corpus size. Absent buckets mean register value 0."""
    bucket, rho = hll_rho_col(value_col, p, seed)
    return (df.select(F.col(group_col).alias("g"),
                      bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("g", "bucket").agg(F.max("rho").alias("rho")))


def hll_merge_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register-wise max — how shard-level sketches combine on a tree
    without re-reading rows. max is idempotent/commutative/associative,
    so merge order and duplication cannot change the state."""
    return (a.unionByName(b).groupBy("g", "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_alpha(m: int) -> float:
    """The standard bias constant; one Python float embedded as a literal
    in BOTH plans so the engines cannot disagree on it."""
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_estimate_df(state: DataFrame, p: int = 12) -> DataFrame:
    """(g, n_regs, v_zero, est): the HLL estimate per group. The harmonic
    sum folds the EXACT dyadic register indicators in ascending bucket
    order inside one bounded collect (<= 2^p rows per group — value-space
    state, the quality_tiers precedent); empty registers contribute
    exactly (m - n_regs) * 1.0. Small-range correction: linear counting
    m*ln(m/V) when raw <= 2.5m and V > 0 (the published rule); ln is the
    single libm call, fenced by round(est, 6)."""
    m = 1 << p
    alpha = hll_alpha(m)
    # dynamic-shift dyadic indicator (the Python shiftleft wrapper wants a
    # literal count, the SQL function takes any int expression)
    ind = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), rho)")
    regs = F.array_sort(F.collect_list(F.struct("bucket", "ind")))
    s_present = F.aggregate(
        regs, F.lit(0.0), lambda acc, r: acc + r["ind"])
    agg = (state.withColumn("ind", ind).groupBy("g")
           .agg(F.count(F.lit(1)).alias("n_regs"),
                s_present.alias("s_present")))
    v = (F.lit(m) - F.col("n_regs")).cast("long")
    s = F.col("s_present") + v.cast("double") * F.lit(1.0)
    raw = F.lit(alpha) * F.lit(float(m * m)) / s
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)
                 ).otherwise(raw)
    return agg.select("g", "n_regs", v.alias("v_zero"),
                      F.round(est, 6).alias("est"))


def hll_distinct_df(df: DataFrame, group_col: str, value_col: str,
                    p: int = 12, seed: str = "hll") -> DataFrame:
    """One-shot build + estimate: (g, n_regs, v_zero, est)."""
    return hll_estimate_df(hll_state_df(df, group_col, value_col, p, seed),
                           p)
