"""Deduplication operators for web-scale corpora.

- exact: hash-groupBy on the normalized-text fingerprint (JVM only).
- n-gram Jaccard: exact pairwise similarity via shingle explode + self-join
  (correct at any scale; the join shuffles on shingle hash so hot shingles
  are the skew point — capped via distinct-per-doc shingles).
- MinHash + LSH: the 100 TB path — constant-size signatures per doc, banding
  turns all-pairs into an equi-join on (band, band_hash) buckets.
- SimHash: 64-bit near-dup fingerprint, hamming-banded candidate join.
- embedding cosine: exact threshold self-join as the small-corpus oracle;
  ``embedding_dup_pairs_banded`` is the scale path (hyperplane-LSH banded
  equi-join, no cartesian).

All randomness is derived from splitmix64 of fixed seeds — signatures are
reproducible across runs, partitionings, and cluster sizes. Token content
hashes are the first 8 bytes of md5 (one C call per unique token, cached),
so every hash in this module is replicable in ANSI SQL (``sqlhash``) and
the DuckDB driver oracles can check minhash/simhash output bit-exactly.
Everything after tokenization is batch-vectorized numpy — no per-token or
per-doc Python loops in the hot path.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .analysis import ascii_fold, whitespace_tokens
from .corpus import splitmix64
from .textops import fingerprint_col


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (post-normalization) docs:
    (fingerprint, n_docs, keep_id = min doc_id). One hash-agg shuffle."""
    return (df.select(F.col(id_col), fingerprint_col(text_col).alias("fingerprint"))
            .groupBy("fingerprint")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keep_id")))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per fingerprint group, no full-row
    shuffle: window-free groupBy + semi-join back."""
    keep = (exact_duplicate_groups(df, text_col, id_col)
            .select(F.col("keep_id").alias(id_col)))
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

_MULT = np.uint64(0x9E3779B97F4A7C15)
_TOKEN_HASH_CACHE: dict[str, int] = {}


def token_hash_u64(s: str) -> int:
    """First 8 bytes (big-endian) of md5(utf-8(s)) — one C call per UNIQUE
    token (cached), replicable in SQL as a fold over the md5 hex prefix
    (``sqlhash.md5_u64``)."""
    got = _TOKEN_HASH_CACHE.get(s)
    if got is None:
        got = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8],
                             "big")
        if len(_TOKEN_HASH_CACHE) < 1_000_000:
            _TOKEN_HASH_CACHE[s] = got
    return got


def _batch_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize + hash one whole Arrow batch: (flat u64 token hashes in doc
    order, per-doc token counts). md5 runs once per unique token in the
    batch; everything else is vectorized."""
    toks = [whitespace_tokens(ascii_fold(t or "")) for t in texts]
    lens = np.fromiter(map(len, toks), np.int64, len(toks))
    if int(lens.sum()) == 0:
        return np.zeros(0, dtype=np.uint64), lens
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if t])
    uniq, inv = np.unique(flat, return_inverse=True)
    th = np.fromiter((token_hash_u64(t) for t in uniq), dtype=np.uint64,
                     count=len(uniq))[inv]
    return th, lens


def _shingle_windows(th: np.ndarray, lens: np.ndarray, k: int,
                     seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of ALL k-token windows of a flat batch (not deduped):
    (doc index per window, u64 window hash), doc-ordered. Window hash is a
    rolling polynomial seeded with splitmix64(seed) over the token hashes,
    finalized with splitmix64 — 2 mul-adds + one finalizer per window, all
    vectorized across the batch."""
    n_docs = lens.size
    wcounts = np.maximum(lens - k + 1, 0)
    total = int(wcounts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    doc_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=doc_starts[1:])
    w_doc = np.repeat(np.arange(n_docs, dtype=np.int64), wcounts)
    w0 = np.repeat(doc_starts, wcounts) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(wcounts) - wcounts, wcounts))
    init = np.uint64(int(splitmix64(np.uint64(seed))))
    with np.errstate(over="ignore"):
        out = np.full(total, init, dtype=np.uint64)
        for j in range(k):
            out = out * _MULT + th[w0 + j]
        out = splitmix64(out)
    return w_doc, out


def _shingle_hashes(text: str, k: int, seed: int = 1337) -> np.ndarray:
    """Distinct k-token-shingle hashes of ONE doc (uint64) — single-doc
    wrapper over the batch kernels (property-test surface)."""
    th, lens = _batch_token_hashes([text])
    _, h = _shingle_windows(th, lens, k, seed)
    return np.unique(h)


def shingles_df(df: DataFrame, k: int = 3, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle bigint) — distinct k-shingle hashes per doc."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            th, lens = _batch_token_hashes(pdf[text_col].tolist())
            w_doc, h = _shingle_windows(th, lens, k, seed=1337)
            # distinct per doc: sort (doc, hash), keep group heads
            order = np.lexsort((h, w_doc))
            wd, hh = w_doc[order], h[order]
            keep = np.ones(hh.size, dtype=bool)
            keep[1:] = (hh[1:] != hh[:-1]) | (wd[1:] != wd[:-1])
            yield pd.DataFrame({
                "doc_id": pd.array(ids[wd[keep]], dtype="int64"),
                "shingle": hh[keep].view(np.int64)})
    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        gen, schema="doc_id long, shingle long")


def shingles_str_df(df: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle string) — distinct k-token shingles as joined strings,
    built entirely from JVM expressions (transform/sequence/concat_ws):
    whole-stage codegen, no Python. The SQL-oracle-parity twin of
    ``shingles_df`` (which hashes for compactness at scale)."""
    from .textops import fold_col, tokens_col
    toks = F.transform(tokens_col(text_col), lambda x: fold_col(x))
    # explode the shingle start position and build the k-token string per
    # emitted row (exploding the transform-built string array re-evaluates
    # the whole array per element — O(n^2) concat work on long docs, the
    # dsir.py lesson); distinct-per-doc moves from in-array array_distinct
    # to a dropDuplicates whose partial aggregate dedups map-side, so
    # boilerplate-heavy docs shrink before the exchange
    base = (df.select(F.col(id_col).alias("doc_id"), toks.alias("_tk"))
            .filter(F.size("_tk") >= k))
    rows = base.select(
        "doc_id", "_tk",
        F.explode(F.expr(f"sequence(0, size(_tk) - {k})")).alias("i"))
    shingle = F.concat_ws(
        " ", *[F.expr(f"element_at(_tk, i + {j + 1})") for j in range(k)])
    return (rows.select("doc_id", shingle.alias("shingle"))
            .dropDuplicates(["doc_id", "shingle"]))


def ngram_jaccard_pairs_str(df: DataFrame, k: int = 3, threshold: float = 0.5,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Exact token-k-gram Jaccard via string shingles — pure JVM pipeline
    (explode → self-equi-join on shingle → hash-agg), ANSI-SQL expressible."""
    sh = shingles_str_df(df, k, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "id_a")
                       .withColumnRenamed("sz", "sz_a"), "id_a")
            .join(sizes.withColumnRenamed("doc_id", "id_b")
                       .withColumnRenamed("sz", "sz_b"), "id_b")
            .withColumn("jaccard", F.col("inter").cast("double")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def ngram_jaccard_pairs(df: DataFrame, k: int = 3, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact pairwise token-k-gram Jaccard ≥ threshold:
    explode distinct shingles → self-join on shingle → |A∩B| / (|A|+|B|-|A∩B|).
    Shuffles on shingle (hot shingles are bounded: distinct per doc)."""
    sh = shingles_df(df, k, text_col, id_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.withColumnRenamed("doc_id", "id_a")
                      .withColumnRenamed("sz", "sz_a"), "id_a")
           .join(sizes.withColumnRenamed("doc_id", "id_b")
                      .withColumnRenamed("sz", "sz_b"), "id_b")
           .withColumn("jaccard", F.col("inter").cast("double")
                       / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, num_hashes: int = 64, k: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       seed: int = 7) -> DataFrame:
    """(doc_id, sig array<bigint>) — num_hashes minhash values per doc.
    h_i(s) = splitmix64(s XOR seed_i), minimized over the doc's shingle
    hashes. Batch-vectorized: one (all-windows × seed) hash + segmented
    min-reduce per seed across the WHOLE Arrow batch (duplicate windows
    cannot change a min, so no dedup pass is needed)."""
    seeds = splitmix64(np.arange(num_hashes, dtype=np.uint64)
                       + np.uint64(seed) * np.uint64(0x9E3779B9))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            th, lens = _batch_token_hashes(pdf[text_col].tolist())
            _, h = _shingle_windows(th, lens, k, seed=1337)
            wcounts = np.maximum(lens - k + 1, 0)
            sig = np.full((ids.size, num_hashes), np.iinfo(np.int64).max,
                          dtype=np.int64)
            nz = wcounts > 0
            if h.size:
                starts = np.zeros(int(nz.sum()), dtype=np.int64)
                np.cumsum(wcounts[nz][:-1], out=starts[1:])
                with np.errstate(over="ignore"):
                    for i in range(num_hashes):
                        m = splitmix64(h ^ seeds[i])
                        sig[nz, i] = np.minimum.reduceat(m, starts).view(
                            np.int64)
            yield pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                                "sig": [row.tolist() for row in sig]})
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen, schema="doc_id long, sig array<long>")


def _sig_bands(sig_df: DataFrame, bands: int,
               rows_per_band: int) -> DataFrame:
    """(doc_id, band, band_hash): one row per signature band — the shared
    banding step of every MinHash-LSH join."""
    return sig_df.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.xxhash64(F.slice(
                "sig", i * rows_per_band + 1, rows_per_band).cast("string"))
        )).alias("band", "band_hash"))


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = 16,
                        rows_per_band: int = 4) -> DataFrame:
    """Band the signatures and equi-join on (band, band_hash) buckets —
    the all-pairs-free near-dup candidate generation that scales."""
    b = _sig_bands(sig_df, bands, rows_per_band)
    x, y = b.alias("x"), b.alias("y")
    return (x.join(y, (F.col("x.band") == F.col("y.band"))
                   & (F.col("x.band_hash") == F.col("y.band_hash"))
                   & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("id_a"),
                    F.col("y.doc_id").alias("id_b"))
            .distinct())


def minhash_jaccard_estimate(sig_df: DataFrame, pairs: DataFrame,
                             sig_df_b: DataFrame | None = None) -> DataFrame:
    """Estimated Jaccard = matching signature positions / num_hashes.
    ``sig_df_b`` supplies the id_b side for bipartite (cross-set) pairs;
    default is the self-join case."""
    sa = sig_df.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sig", "sig_a")
    sb = (sig_df if sig_df_b is None else sig_df_b) \
        .withColumnRenamed("doc_id", "id_b").withColumnRenamed("sig", "sig_b")
    eq = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b:
                                    (a == b).cast("int")), lambda v: v == 1))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard_est", eq.cast("double") / F.size("sig_a"))
            .select("id_a", "id_b", "jaccard_est"))


def minhash_dedup_pairs(df: DataFrame, threshold: float = 0.8,
                        num_hashes: int = 64, k: int = 3, bands: int = 16,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    signature-estimate filter."""
    sigs = minhash_signatures(df, num_hashes, k, text_col, id_col).cache()
    cands = lsh_candidate_pairs(sigs, bands, num_hashes // bands)
    return (minhash_jaccard_estimate(sigs, cands)
            .filter(F.col("jaccard_est") >= threshold))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_col_df(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", seed: int = 99) -> DataFrame:
    """(doc_id, simhash bigint): 64-bit SimHash over seeded token hashes
    weighted by term frequency. Token hash = splitmix64(md5_u64(token) XOR
    splitmix64(seed)); docs with no tokens get simhash 0. Batch-vectorized:
    per-(doc, token) counts via one lexsort, then 64 segmented bit-weight
    reductions across the whole Arrow batch."""
    seed_c = np.uint64(int(splitmix64(np.uint64(seed))))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(np.int64)
            th, lens = _batch_token_hashes(pdf[text_col].tolist())
            out = np.zeros(ids.size, dtype=np.int64)
            if th.size:
                with np.errstate(over="ignore"):
                    ths = splitmix64(th ^ seed_c)
                doc_idx = np.repeat(np.arange(ids.size, dtype=np.int64),
                                    lens)
                # unique (doc, token-hash) rows with occurrence counts
                order = np.lexsort((ths, doc_idx))
                d_s, t_s = doc_idx[order], ths[order]
                head = np.ones(t_s.size, dtype=bool)
                head[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
                gstart = np.flatnonzero(head)
                counts = np.diff(np.append(gstart, t_s.size)).astype(
                    np.float64)
                u_d, u_t = d_s[gstart], t_s[gstart]
                dhead = np.ones(u_d.size, dtype=bool)
                dhead[1:] = u_d[1:] != u_d[:-1]
                dstart = np.flatnonzero(dhead)
                sh = np.zeros(dstart.size, dtype=np.uint64)
                for b in range(64):
                    bit = ((u_t >> np.uint64(b)) & np.uint64(1)).astype(
                        np.float64)
                    acc = np.add.reduceat((2.0 * bit - 1.0) * counts, dstart)
                    sh |= (acc > 0).astype(np.uint64) << np.uint64(b)
                out[u_d[dstart]] = sh.view(np.int64)
            yield pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                                "simhash": pd.array(out, dtype="int64")})
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen, schema="doc_id long, simhash long")


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via 4×16-bit band
    join (any pair within distance 3 shares at least one exact band)."""
    sh = simhash_col_df(df, text_col, id_col).cache()
    banded = sh.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF))
            for b in range(4)])).alias("band", "band_val"))
    x, y = banded.alias("x"), banded.alias("y")
    cand = (x.join(y, (F.col("x.band") == F.col("y.band"))
                   & (F.col("x.band_val") == F.col("y.band_val"))
                   & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("id_a"),
                    F.col("y.doc_id").alias("id_b"),
                    F.col("x.simhash").alias("sh_a"),
                    F.col("y.simhash").alias("sh_b"))
            .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def _pair_cosine() -> "F.Column":
    """cosine(a.v, b.v) as a JVM fold — ordered left-fold, so bit-identical
    regardless of which side of the pair each vector lands on (per-element
    products commute; the summation order is the element order)."""
    dot = F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda side: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(f"{side}.v"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x))
    return dot / (norm("a") * norm("b"))


def embedding_dup_pairs(emb_df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_blocks: int = 16) -> DataFrame:
    """EXACT cosine-similarity ≥ threshold pairs via a block-tiled
    equi-join (1-bucket-theta style, Okcan & Riedewald SIGMOD'11): ids hash
    into ``n_blocks`` blocks, the upper-triangle grid of block pairs is a
    tiny broadcast table, and each (i, j) tile becomes one equi-join key —
    so the inherent O(n²) comparison work lands as G(G+1)/2 BALANCED
    shuffle-partitioned tasks with bounded (n/G)² tile memory, instead of
    Spark's BroadcastNestedLoopJoin cartesian (which ships one whole side
    to every executor and OOMs at scale). Output is exact and identical to
    a brute self-join. Size ``n_blocks`` so n/G rows of (id, vec) fit an
    executor core's memory; at 100 TB that's G in the thousands.

    Exact low-threshold similarity join is inherently quadratic; for true
    NEAR-dup thresholds (≥~0.85) use ``embedding_dup_pairs_banded``, which
    prunes candidates with hyperplane LSH instead of enumerating tiles."""
    base = emb_df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).cast("array<double>").alias("v"))
    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int")
    grid = emb_df.sparkSession.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "ga int, gb int")
    # replicate each side along its grid axis (broadcast joins — narrow),
    # then ONE shuffle on the composite tile key (ga, gb)
    a = (base.withColumn("ga", blk)
         .join(F.broadcast(grid), "ga").alias("a"))
    b = (base.withColumn("gb", blk)
         .join(F.broadcast(grid), "gb").alias("b"))
    pairs = (a.join(b, ["ga", "gb"])
             .filter((F.col("ga") < F.col("gb"))
                     | (F.col("a.id") < F.col("b.id"))))
    return (pairs.select(
                F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                _pair_cosine().alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def embedding_dup_pairs_banded(emb_df: DataFrame, threshold: float = 0.95,
                               n_bands: int = 8, planes_per_band: int = 8,
                               seed: int = 5, id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               dim: int | None = None) -> DataFrame:
    """Near-dup pairs via hyperplane-LSH banding — the 100 TB path: each
    vector gets ``n_bands`` sign-bit bucket ids (one per band of
    ``planes_per_band`` seeded hyperplanes), candidates are the equi-join
    on (band, bucket), and candidates are verified with the exact cosine.
    No cartesian anywhere; recall is the standard LSH amplification
    1-(1-p^r)^b for p = 1-θ/π. Deterministic end-to-end (planes from
    splitmix64, ordered-fold dots), so a SQL oracle can replicate the
    pruning bit-exactly, not just the survivors."""
    from . import ann

    if dim is None:  # inference costs an eager job; pass dim= to skip it
        row = emb_df.select(vec_col).first()
        if row is None or row[0] is None:
            raise ValueError("cannot infer vector dim from an empty "
                             "DataFrame; pass dim= explicitly")
        dim = len(row[0])
    plane_sets = [ann.hyperplanes(dim, planes_per_band, seed=seed + 101 * b)
                  for b in range(n_bands)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)))
            ids = pdf[id_col].to_numpy(np.int64)
            out_id = np.tile(ids, n_bands)
            out_band = np.repeat(np.arange(n_bands, dtype=np.int32),
                                 ids.size)
            out_bkt = np.concatenate([
                ann.lsh_bucket_of(vecs, plane_sets[b])
                for b in range(n_bands)])
            yield pd.DataFrame({"id": out_id, "band": out_band,
                                "bucket": out_bkt})

    base = emb_df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).cast("array<double>").alias("v"))
    banded = (emb_df.select(F.col(id_col), F.col(vec_col))
              .mapInPandas(gen, "id long, band int, bucket long")
              .cache())  # both sides of the candidate self-join read it
    x, y = banded.alias("x"), banded.alias("y")
    cand = (x.join(y, (F.col("x.band") == F.col("y.band"))
                   & (F.col("x.bucket") == F.col("y.bucket"))
                   & (F.col("x.id") < F.col("y.id")))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct())
    a = base.withColumnRenamed("id", "id_a").alias("a")
    b = base.withColumnRenamed("id", "id_b").alias("b")
    return (cand.join(a, "id_a").join(b, "id_b")
            .select("id_a", "id_b", _pair_cosine().alias("cosine"))
            .filter(F.col("cosine") >= threshold))


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over candidate pairs)
# ---------------------------------------------------------------------------

def dup_clusters(pairs_df: DataFrame, ids_df: DataFrame | None = None,
                 id_a: str = "id_a", id_b: str = "id_b",
                 max_iters: int = 64) -> DataFrame:
    """Connected components over a duplicate-pair edge list — the step after
    every candidate generator above (minhash/simhash/embedding pairs are
    PAIRS; dedup policy needs CLUSTERS: keep one doc per component).

    Returns (id, cluster_id, cluster_size) where cluster_id is the minimum
    id in the component; keep-one-per-cluster is then
    ``filter(id == cluster_id)``. ``ids_df`` (one column, any name) adds
    corpus ids with no dup edges as singleton clusters so the output covers
    the whole corpus, not just docs that appear in some pair.

    Distributed Pregel-style min-label propagation with POINTER JUMPING:
    each round (a) every node takes the min label over its neighbors — one
    shuffle join + hash-agg — and (b) labels shortcut through their current
    root (label <- label(label)), which collapses label chains geometrically,
    so rounds are O(log diameter) rather than O(diameter) — the same
    shortcutting GraphX's connectedComponents Pregel loop relies on. Each
    round materializes via localCheckpoint (lineage stays O(1), a crashed
    round recomputes one join, and AQE re-plans every round on the true,
    shrinking sizes). Dup graphs at corpus scale are huge in components but
    tiny in diameter (near-clique bundles of mirrors), so rounds is small —
    fail-loud at ``max_iters`` rather than silently emitting a half-merged
    labeling. Reference has no analogue (single-machine fates never
    clusters; keep-policy is the caller's); target-new for the 100 TB
    dedup pipeline, alongside [exact_dedup]'s fingerprint groups.
    """
    pairs = (pairs_df.select(F.col(id_a).cast("long").alias("src"),
                             F.col(id_b).cast("long").alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    edges = pairs.union(pairs.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
    nodes = edges.select(F.col("src").alias("id")).distinct()
    if ids_df is not None:
        extra = ids_df.select(
            F.col(ids_df.columns[0]).cast("long").alias("id"))
        nodes = nodes.union(extra).distinct()
    edges = edges.localCheckpoint(eager=True)  # reused every round
    labels = (nodes.select("id", F.col("id").alias("label"))
              .localCheckpoint(eager=True))

    for _ in range(max_iters):
        # (a) neighbor-min: tightest label visible across each node's edges
        prop = (edges.join(labels.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("label").alias("nbr_min")))
        stepped = (labels.join(prop, "id", "left")
                   .select("id", F.least(
                       "label", F.coalesce("nbr_min", "label"))
                       .alias("label")))
        # (b) pointer jump: label <- label(label); labels are node ids, so
        # the root lookup is a self-join (left: a root's own row is absent
        # only transiently, coalesce keeps it)
        root = stepped.select(F.col("id").alias("label"),
                              F.col("label").alias("root_label"))
        jumped = (stepped.join(root, "label", "left")
                  .select("id", F.coalesce("root_label", "label")
                          .alias("label"))
                  .localCheckpoint(eager=True))
        changed = (jumped.join(labels.withColumnRenamed("label", "old"),
                               "id")
                   .filter(F.col("label") != F.col("old")).count())
        labels = jumped
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} rounds — "
            "pathological edge list (labels still moving)")

    out = labels.select("id", F.col("label").alias("cluster_id"))
    sizes = out.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return out.join(sizes, "cluster_id").select(
        "id", "cluster_id", "cluster_size")


# ---------------------------------------------------------------------------
# exact-substring dedup (rolling token windows) + benchmark decontamination
# ---------------------------------------------------------------------------

def substring_window_hashes(df: DataFrame, w: int = 50, stride: int = 1,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """(id, win_start, whash) for every ``w``-token window at the given
    stride — the building block of exact-substring deduplication
    ("Deduplicating Training Data Makes Language Models Better", Lee et al.
    2022: two corpus spans are duplicates iff they share a >=w-token exact
    substring; every such span contains a shared aligned w-token window, so
    window-hash equality finds exactly the Lee-style duplicates at
    window granularity).

    ``whash`` is md5 of the space-joined ASCII-folded tokens, so the DuckDB
    driver oracle replicates it bit-exactly. ``win_start`` is the 0-based
    token index of the window start.

    Plan shape: tokenize -> ``sequence``/``transform``/``slice`` -> explode,
    all JVM whole-stage-codegen expressions, NARROW (rows never leave their
    scan partition) — callers add the one shuffle they need. At 10^12 docs
    the output is corpus-token-scale by design (so is the suffix array the
    reference algorithm builds); ``stride > 1`` trades recall granularity
    for a 1/stride row reduction when screening.

    Reference analogue: none (target-new training-data op; the reference's
    suffix-array reader lib/suffix_array_reader.rb solves lookup, not
    cross-doc dedup).
    """
    from .textops import WS_RE, fold_col
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), WS_RE),
        lambda x: x != F.lit(""))
    base = df.select(F.col(id_col).alias("id"),
                     F.split(fold_col(F.array_join(toks, " ")), " ")
                      .alias("_ftoks"))
    n = F.size(F.col("_ftoks"))
    # windows start at 0, stride apart, last start = n - w.
    # Explode the START POSITIONS (cheap ints) and hash per emitted row —
    # never explode(transform(..., md5(slice))): GenerateExec re-evaluates
    # the generator child per emitted element, turning the per-window
    # slice+md5 into O(windows^2) work per doc (the dsir.py lesson;
    # measured 25x on this operator's stage at 200k pages).
    starts = F.when(n >= w, F.sequence(F.lit(0), n - w, F.lit(stride))) \
              .otherwise(F.array().cast("array<int>"))
    return (base.select("id", "_ftoks",
                        F.explode(starts).alias("win_start"))
            .select("id", "win_start",
                    F.md5(F.array_join(
                        F.slice(F.col("_ftoks"), F.col("win_start") + 1, w),
                        " ")).alias("whash")))


def substring_dup_windows(df: DataFrame, w: int = 50, stride: int = 1,
                          text_col: str = "text", id_col: str = "doc_id",
                          min_docs: int = 2) -> DataFrame:
    """Every window whose exact w-token content appears in >= ``min_docs``
    DISTINCT docs: (id, win_start, whash, n_docs). These are the spans an
    ExactSubstr-style dedup pass would cut.

    Two passes over the corpus windows (count, then re-derive + join) — the
    alternative, collecting (id, win_start) lists per hash, is unbounded for
    boilerplate shared by millions of pages. The duplicated-hash table is
    distinct-duplicated-window-sized (corpus boilerplate, not corpus text);
    the join shuffles on whash where AQE handles the hot-boilerplate skew.
    """
    wh = substring_window_hashes(df, w, stride, text_col, id_col)
    dups = (wh.groupBy("whash")
            .agg(F.count_distinct("id").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs))
    return wh.join(dups, "whash").select("id", "win_start", "whash", "n_docs")


def substring_dup_doc_stats(df: DataFrame, w: int = 50, stride: int = 1,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Per-doc exact-substring duplication summary:
    (id, n_windows, dup_windows, dup_frac). ``dup_frac`` is the fraction of
    the doc's windows whose content recurs in another doc — the corpus-level
    signal training-data pipelines threshold on before paying for span
    surgery. Docs shorter than w tokens have 0 windows and dup_frac 0.0."""
    wh = substring_window_hashes(df, w, stride, text_col, id_col)
    dups = (wh.groupBy("whash")
            .agg(F.count_distinct("id").alias("n_docs")))
    per_win = wh.join(dups, "whash")
    stats = (per_win.groupBy("id")
             .agg(F.count("*").alias("n_windows"),
                  F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
                   .alias("dup_windows")))
    ids = df.select(F.col(id_col).alias("id"))
    out = ids.join(stats, "id", "left")
    return out.select(
        "id",
        F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
        F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
        F.when(F.coalesce("n_windows", F.lit(0)) > 0,
               F.round(F.coalesce("dup_windows", F.lit(0)).cast("double")
                       / F.col("n_windows"), 6)).otherwise(F.lit(0.0))
         .alias("dup_frac"))


def decontaminate_flags(df: DataFrame, bench_df: DataFrame, n: int = 13,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any exact
    ``n``-token window with a benchmark/eval set (the standard n-gram
    overlap rule — GPT-3 used 13-gram collision, PaLM/Llama the same shape).

    Returns (id, n_hits, contaminated): ``n_hits`` = how many of the doc's
    window POSITIONS collide with a benchmark n-gram, ``contaminated`` =
    n_hits > 0.

    Scale: the benchmark side is eval-set-sized (thousands of docs), so its
    distinct n-gram hash set broadcasts; the corpus side stays NARROW — its
    windows are filtered by the broadcast hash join in the scan stage and
    only the (rare) hits reach the one per-doc count shuffle. The corpus is
    never shuffled and never re-read.
    """
    bench = (substring_window_hashes(
        bench_df, w=n, stride=1, text_col=bench_text_col, id_col=id_col)
        .select("whash").distinct())
    grams = substring_window_hashes(df, w=n, stride=1, text_col=text_col,
                                    id_col=id_col)
    hits = (grams.join(F.broadcast(bench), "whash")
            .groupBy("id").agg(F.count("*").alias("n_hits")))
    ids = df.select(F.col(id_col).alias("id"))
    return (ids.join(hits, "id", "left")
            .select("id",
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                     .alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                     .alias("contaminated")))


# ---------------------------------------------------------------------------
# corpus-wide paragraph dedup with text rewrite (CCNet-style)
# ---------------------------------------------------------------------------

def paragraph_dedup_df(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Corpus-level paragraph deduplication with text REWRITE (the CCNet
    pipeline's dedup stage, Wenzek et al. 2020: hash every paragraph of
    every document, keep exactly one copy of each duplicated paragraph
    corpus-wide, drop the rest, and reassemble the surviving text).

    Paragraphs are '\\n'-separated lines; the dedup key is md5 of the
    ASCII-folded space-trimmed paragraph (so the DuckDB driver oracle
    replicates it bit-exactly), while the REWRITTEN text keeps the original
    bytes. The canonical (kept) occurrence of a duplicated paragraph is the
    globally smallest (doc_id, para_idx) — deterministic across runs,
    partitionings, and cluster sizes. Paragraphs that are empty after
    trimming never participate in dedup and always survive (dropping them
    would silently glue unrelated paragraphs together).

    Returns one row per input doc:
    (id, n_paras, n_dropped, clean_len, clean_md5) where ``n_paras`` counts
    non-empty paragraphs, ``n_dropped`` how many this rewrite removed, and
    ``clean_md5``/``clean_len`` digest the reassembled '\\n'-joined text
    (the full text is one projection away; the digest keeps driver compare
    payloads bounded).

    Plan shape (sized for 10^12 docs): posexplode is NARROW; the canonical
    occurrence comes from ONE groupBy(key) whose min/count aggregates are
    map-side combinable — a boilerplate paragraph shared by 10^8 pages
    pre-aggregates inside each scan task, so the shuffle carries one row
    per (task, key), not per occurrence. The join back on key is the skew
    point and is AQE-skew-splittable (the canonical table has exactly one
    row per distinct paragraph). Reassembly is the second, unavoidable
    shuffle (text rewriting must regroup a doc's surviving rows).
    A window (`min over (partition by key)`) would save the join but puts
    every occurrence of the hot key in ONE task — the groupBy+join shape is
    the one that survives head-paragraph skew.

    Reference analogue: none (target-new training-data op).
    """
    from .textops import fold_col
    p = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
         .alias("idx", "para"))
    p = p.withColumn("_k", F.md5(fold_col(F.trim(F.col("para"))))) \
         .withColumn("_ne", F.trim(F.col("para")) != F.lit(""))
    canon = (p.filter("_ne")
             .groupBy("_k")
             .agg(F.min(F.struct("id", "idx")).alias("first")))
    kept = (p.join(canon, "_k", "left")
            .withColumn("_keep",
                        (~F.col("_ne"))
                        | ((F.col("first.id") == F.col("id"))
                           & (F.col("first.idx") == F.col("idx")))))
    per_doc = (kept.groupBy("id").agg(
        F.sum(F.col("_ne").cast("long")).alias("n_paras"),
        F.sum((F.col("_ne") & ~F.col("_keep")).cast("long"))
         .alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("_keep"),
                                          F.struct("idx", "para")))),
                lambda s: s["para"]),
            "\n").alias("_clean")))
    return per_doc.select(
        "id", "n_paras", "n_dropped",
        F.length("_clean").cast("long").alias("clean_len"),
        F.md5(F.col("_clean")).alias("clean_md5"))


def substring_cut_df(df: DataFrame, w: int = 50, stride: int = 1,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     broadcast_dups: bool = True) -> DataFrame:
    """ExactSubstr span SURGERY (the rewrite half of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): cut every
    token position covered by a duplicated ``w``-token window, keeping the
    globally canonical (min (doc_id, win_start)) occurrence of each window
    content, then reassemble the surviving tokens. Complements
    ``substring_dup_doc_stats`` (which only measures) — this produces the
    cleaned corpus.

    Semantics are positional: a token survives iff no non-canonical
    duplicated window covers it. Within-doc repeats count as duplicates
    (n_occurrences >= 2, not n_docs >= 2). The rewritten text is the
    space-join of surviving ASCII-folded tokens — the same token stream
    the window hashes were computed over. With ``stride > 1`` only
    stride-aligned windows are detected, so surgery is exact at
    ``stride=1`` and a cheaper screen above it.

    Returns (id, n_tokens, n_cut, clean_len, clean_md5) — one row per
    input doc; the full cleaned text is one projection away (digest keeps
    driver payloads bounded).

    Plan shape at 10^12 docs: window generation is NARROW; the duplicate
    table comes from ONE groupBy(whash) whose count/min aggregates are
    map-side combinable (hot boilerplate pre-aggregates per scan task).
    The join back is a BROADCAST by default (``broadcast_dups=True``):
    the dups table holds only hashes seen >= 2 times — boilerplate-scale,
    like the decontamination set — so the corpus-token-scale window side
    never shuffles for the join (the round-4 2M probe caught the
    alternative: at 200k AQE auto-broadcast the post-agg dups, at 2M it
    tipped into a full sort-merge shuffle of the window table and the op
    went 25x for 10x rows — 2.4x after this fix). Set
    ``broadcast_dups=False`` for pathological corpora where most windows
    are duplicated (the dups table is then itself corpus-scale). Window
    hashes are BINARY md5 (16 bytes, unhex) — same 128-bit exactness,
    half the groupBy-shuffle key bytes of the hex string. Cut starts
    regroup per-doc (bounded by the doc's own token count); the final
    interval merge + token filter is pure JVM expressions over STAGED
    projections — each array is a materialized column, never an
    expression re-evaluated inside a lambda (the repetition_df lesson).

    Reference analogue: none (target-new training-data op; the
    reference's suffix arrays, lib/suffix_array.rb, answer substring
    LOOKUP, not corpus-wide span dedup)."""
    from .textops import WS_RE, fold_col
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), WS_RE),
        lambda x: x != F.lit(""))
    base = df.select(F.col(id_col).alias("id"),
                     F.split(fold_col(F.array_join(toks, " ")), " ")
                      .alias("_ftoks"))
    ftoks = F.col("_ftoks")
    n = F.size(ftoks)
    starts = F.when(n >= w, F.sequence(F.lit(0), n - w, F.lit(stride))) \
              .otherwise(F.array().cast("array<int>"))
    # explode the start positions, hash per emitted row (the dsir.py /
    # substring_window_hashes lesson: never explode(transform(..., md5)))
    wins = (base.select(
        "id", "_ftoks", F.explode(starts).alias("win_start"))
        .select("id", "win_start",
                F.unhex(F.md5(F.array_join(
                    F.slice(ftoks, F.col("win_start") + 1, w), " ")))
                 .alias("whash")))
    dups = (wins.groupBy("whash")
            .agg(F.count("*").alias("n_occ"),
                 F.min(F.struct("id", "win_start")).alias("first"))
            .filter(F.col("n_occ") >= 2))
    if broadcast_dups:
        dups = F.broadcast(dups)
    cut_starts = (wins.join(dups, "whash")
                  .filter(~((F.col("first.id") == F.col("id"))
                            & (F.col("first.win_start")
                               == F.col("win_start"))))
                  .groupBy("id")
                  .agg(F.array_sort(F.collect_list("win_start"))
                        .alias("_cuts")))
    j = base.join(cut_starts, "id", "left").withColumn(
        "_cuts", F.coalesce(F.col("_cuts"), F.array().cast("array<int>")))
    # merge sorted cut starts into disjoint [lo, hi) intervals — one linear
    # fold; a start extends the open interval iff it begins inside it
    iv_t = "array<struct<lo:int,hi:int>>"
    merged = F.aggregate(
        F.col("_cuts"),
        F.array().cast(iv_t),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (s <= F.element_at(acc, -1)["hi"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["lo"].alias("lo"),
                    F.greatest(F.element_at(acc, -1)["hi"],
                               s + F.lit(w)).alias("hi")))),
        ).otherwise(F.concat(acc, F.array(F.struct(
            s.alias("lo"), (s + F.lit(w)).alias("hi"))))))
    s2 = j.withColumn("_iv", merged)
    iv = F.col("_iv")
    # the folded empty doc tokenizes to [''] via split('', ' ') — treat as 0
    ntok = F.when((F.size(ftoks) == 1)
                  & (F.element_at(ftoks, 1) == F.lit("")),
                  F.lit(0)).otherwise(F.size(ftoks))
    kept = F.when(
        ntok > 0,
        F.filter(
            F.sequence(F.lit(0), ntok - 1),
            lambda i: ~F.exists(iv, lambda v: (v["lo"] <= i)
                                & (i < v["hi"])))
    ).otherwise(F.array().cast("array<int>"))
    s3 = s2.withColumn("_kept", kept)
    clean = F.array_join(
        F.transform(F.col("_kept"),
                    lambda i: F.element_at(ftoks, i + 1)), " ")
    return s3.select(
        "id",
        ntok.cast("long").alias("n_tokens"),
        (ntok - F.size(F.col("_kept"))).cast("long").alias("n_cut"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_md5"))


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication inside k-means cells (Abbas et al. 2023)


def semdedup(emb_df: DataFrame, threshold: float = 0.5,
             n_centroids: int = 8, n_iters: int = 2, seed: str = "ivf",
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None, n_blocks: int = 8,
             centroids: "np.ndarray | None" = None,
             kernel: str = "fold") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 §3): cluster the
    embedding space with k-means, compare cosine similarity only WITHIN a
    cluster, and drop every document that has a semantic duplicate — a
    same-cell neighbor with cosine ≥ ``threshold`` and a smaller id (the
    deterministic keep-min-id tie contract; the paper keeps a per-group
    exemplar, which this greedy rule implements without an extra
    cluster-the-duplicates pass). Output: (id, ivf_cid, keep) for every
    input vector, ``keep = false`` iff the doc is a semantic dup.

    100 TB shape: clustering reuses ``ann.ivf_train`` (per-iteration ONE
    narrow Arrow pass of map-side partial sums — the corpus is never
    shuffled) and assignment is one narrow pass against the broadcast
    codebook. The within-cell quadratic compare — SemDeDup's inherent
    cost, bounded by cluster granularity (the paper runs 110k clusters so
    cells stay ~10⁴ docs) — lands as a (cell, tile) equi-join using the
    same 1-bucket-theta block grid as ``embedding_dup_pairs``: per-task
    memory is a (|cell|/G)² tile, never a whole cell, and NO
    BroadcastNestedLoopJoin/cartesian appears in the plan. Skewed giant
    cells split across G(G+1)/2 balanced tasks; AQE handles the residue.
    Deterministic end-to-end (grid-quantized Lloyd, ordered-fold cosine),
    so the DuckDB oracle replicates cells AND survivors bit-exactly.

    ``kernel`` picks the pair-compare implementation:

    - ``"fold"`` (default): per-pair JVM ``zip_with``/``aggregate`` cosine
      — the ordered left-fold DuckDB's ``list_cosine_similarity`` matches
      bit-for-bit, so this is the oracle-checked path. Cost: one
      interpreted 64-element fold per candidate pair.
    - ``"numpy"``: per-(cell, tile) ``applyInPandas`` BLAS kernel — the
      paper's actual within-cluster sim-matrix shape and the 100 TB
      throughput path (~40x the fold kernel at bench scale). Identical
      survivors except when a pair's cosine sits within float-summation
      ulps of the threshold (BLAS blocked summation vs ordered fold);
      cross-validated against the fold kernel in tests.

    Reference analogue: none (fates has no embedding surface);
    target-new per the survey's LLM-data dedup mandate."""
    from . import ann

    if dim is None:
        row = emb_df.select(vec_col).first()
        if row is None or row[0] is None:
            raise ValueError("cannot infer vector dim from an empty "
                             "DataFrame; pass dim= explicitly")
        dim = len(row[0])
    if centroids is None:
        centroids = ann.ivf_train(emb_df, dim, n_centroids=n_centroids,
                                  n_iters=n_iters, seed=seed,
                                  id_col=id_col, vec_col=vec_col)
    assigned = ann.ivf_assign(emb_df, centroids, id_col=id_col,
                              vec_col=vec_col)
    base = assigned.select(F.col(id_col).alias("id"),
                           F.col(vec_col).cast("array<double>").alias("v"),
                           "ivf_cid")
    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int")
    grid = emb_df.sparkSession.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "ga int, gb int")
    if kernel == "numpy":
        removed = _semdedup_removed_numpy(base, grid, blk, threshold)
    elif kernel == "fold":
        a = (base.withColumn("ga", blk)
             .join(F.broadcast(grid), "ga").alias("a"))
        b = (base.withColumn("gb", blk)
             .join(F.broadcast(grid), "gb").alias("b"))
        pairs = (a.join(b, ["ivf_cid", "ga", "gb"])
                 .filter((F.col("ga") < F.col("gb"))
                         | (F.col("a.id") < F.col("b.id"))))
        # removed = the GREATER id of every dup pair (keep-min-id); a doc
        # may appear in many pairs — distinct keeps the anti-join tight
        removed = (pairs.filter(_pair_cosine() >= threshold)
                   .select(F.greatest(F.col("a.id"),
                                      F.col("b.id")).alias("id"))
                   .distinct())
    else:
        raise ValueError(f"unknown kernel {kernel!r} (fold|numpy)")
    return (assigned.select(F.col(id_col).alias("id"), "ivf_cid")
            .join(removed.withColumn("__rm", F.lit(True)), "id", "left")
            .select("id", "ivf_cid",
                    F.col("__rm").isNull().alias("keep")))


def _semdedup_removed_numpy(base: DataFrame, grid: DataFrame, blk,
                            threshold: float) -> DataFrame:
    """Distinct removed ids via a per-(cell, tile) BLAS kernel: each group
    holds at most two tile-blocks of one cell (bounded memory), the sim
    matrix is one float64 matmul, and only the ids that lose a pair (the
    greater id at cosine ≥ threshold) leave the worker."""
    rep = base.withColumn("blk", blk)
    # side 0 = the ga block, side 1 = the gb block; a diagonal tile is
    # emitted once (side 0 only) and the kernel goes upper-triangle
    s0 = (rep.join(F.broadcast(grid), rep["blk"] == grid["ga"])
          .withColumn("side", F.lit(0)))
    s1 = (rep.join(F.broadcast(grid), rep["blk"] == grid["gb"])
          .filter(F.col("ga") != F.col("gb"))
          .withColumn("side", F.lit(1)))
    both = s0.unionByName(s1).select("ivf_cid", "ga", "gb", "side",
                                     "id", "v")
    thr = float(threshold)

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        va = pdf[pdf["side"] == 0]
        vb = pdf[pdf["side"] == 1]
        if not len(va):  # a cell can be empty on one block of a tile
            return pd.DataFrame({"id": np.array([], dtype=np.int64)})
        ida = va["id"].to_numpy(np.int64)
        xa = np.stack(va["v"].map(
            lambda v: np.asarray(v, dtype=np.float64)))
        xa_n = xa / np.linalg.norm(xa, axis=1, keepdims=True)
        diag = bool(pdf["ga"].iloc[0] == pdf["gb"].iloc[0])
        if not diag and not len(vb):  # other block empty in this cell
            return pd.DataFrame({"id": np.array([], dtype=np.int64)})
        if not diag:
            idb = vb["id"].to_numpy(np.int64)
            xb = np.stack(vb["v"].map(
                lambda v: np.asarray(v, dtype=np.float64)))
            xb_n = xb / np.linalg.norm(xb, axis=1, keepdims=True)
            sims = xa_n @ xb_n.T
            hit = sims >= thr
        else:  # diagonal tile: upper triangle of the self-matrix
            idb = ida
            sims = xa_n @ xa_n.T
            hit = np.triu(sims >= thr, k=1)
        ii, jj = np.nonzero(hit)
        if not ii.size:
            return pd.DataFrame({"id": np.array([], dtype=np.int64)})
        gone = np.unique(np.maximum(ida[ii], idb[jj]))
        return pd.DataFrame({"id": gone})

    return (both.groupBy("ivf_cid", "ga", "gb")
            .applyInPandas(tile, "id long").distinct())


# ---------------------------------------------------------------------------
# fuzzy benchmark decontamination (cross-set MinHash near-dup flags)


def decontaminate_fuzzy_flags(corpus_df: DataFrame, bench_df: DataFrame,
                              threshold: float = 0.5, num_hashes: int = 64,
                              k: int = 3, bands: int = 16,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """FUZZY benchmark decontamination: flag every corpus document that is
    a MinHash near-duplicate (estimated Jaccard ≥ ``threshold``) of ANY
    benchmark document. The n-gram rule (``decontaminate_flags``) catches
    verbatim leaks; this catches paraphrased / lightly-edited leaks — the
    Llama-style second decontamination pass. Output per corpus doc:
    (id, fuzzy_contaminated, n_bench_matches, max_jaccard_est).

    100 TB shape: both sides get constant-size signatures (one narrow
    Arrow pass each); the benchmark side is EVAL-SET-SIZED, so its banded
    signature table BROADCASTS into the candidate join — the corpus is
    never shuffled for candidate generation (same contract as the n-gram
    rule, plan-asserted in tests). Only banded collisions reach the
    estimate join and the per-doc aggregate, both bounded by the hit
    count, not the corpus. Deterministic signatures (splitmix64/md5), so
    the DuckDB oracle replicates candidates AND estimates bit-exactly.

    Reference analogue: none; target-new per the survey's LLM-data ops
    mandate (composes with ``dedup.decontaminate_flags``)."""
    rows_per_band = num_hashes // bands
    csig = minhash_signatures(corpus_df, num_hashes, k, text_col, id_col)
    bsig = minhash_signatures(bench_df, num_hashes, k, text_col,
                              id_col).cache()
    cb = _sig_bands(csig, bands, rows_per_band).alias("x")
    bb = F.broadcast(_sig_bands(bsig, bands, rows_per_band)).alias("y")
    cand = (cb.join(bb, (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.band_hash") == F.col("y.band_hash")))
            .select(F.col("x.doc_id").alias("id_a"),
                    F.col("y.doc_id").alias("id_b"))
            .distinct())
    est = minhash_jaccard_estimate(csig, cand, sig_df_b=F.broadcast(bsig))
    hits = (est.filter(F.col("jaccard_est") >= threshold)
            .groupBy("id_a")
            .agg(F.count("*").alias("n_bench_matches"),
                 F.max("jaccard_est").alias("max_jaccard_est")))
    return (corpus_df.select(F.col(id_col).alias("id"))
            .join(hits.withColumnRenamed("id_a", "id"), "id", "left")
            .select(
                "id",
                F.col("n_bench_matches").isNotNull()
                .alias("fuzzy_contaminated"),
                F.coalesce("n_bench_matches", F.lit(0)).cast("long")
                .alias("n_bench_matches"),
                F.round(F.coalesce("max_jaccard_est", F.lit(0.0)), 4)
                .alias("max_jaccard_est")))
