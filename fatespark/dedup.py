"""Deduplication operators for web-scale corpora.

- exact: hash-groupBy on the normalized-text fingerprint (JVM only).
- n-gram Jaccard: exact pairwise similarity via shingle explode + self-join
  (correct at any scale; the join shuffles on shingle hash so hot shingles
  are the skew point — capped via distinct-per-doc shingles).
- MinHash + LSH: the 100 TB path — constant-size signatures per doc, banding
  turns all-pairs into an equi-join on (band, band_hash) buckets.
- SimHash: 64-bit near-dup fingerprint, hamming-banded candidate join.
- embedding cosine: exact threshold self-join for small dims/corpora; the
  scale path reuses the LSH banding idea with random hyperplanes (see ann.py).

All randomness is derived from splitmix64 of fixed seeds — signatures are
reproducible across runs, partitionings, and cluster sizes.
"""

from __future__ import annotations

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

def _shingle_hashes(text: str, k: int, seed: int = 1337) -> np.ndarray:
    """Distinct k-token-shingle hashes of one doc (uint64), via a rolling
    polynomial over per-token splitmix64 hashes — deterministic and
    library-version independent."""
    toks = whitespace_tokens(ascii_fold(text or ""))
    n = len(toks)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    # token content hash: splitmix64 chain over utf-8 bytes, vectorized per
    # unique token via python-level cache (tokens repeat heavily)
    uniq, inv = np.unique(np.array(toks, dtype=object), return_inverse=True)
    th = np.fromiter((_str_hash(t, seed) for t in uniq), dtype=np.uint64,
                     count=len(uniq))[inv]
    with np.errstate(over="ignore"):
        out = np.zeros(n - k + 1, dtype=np.uint64)
        mult = np.uint64(0x9E3779B97F4A7C15)
        for i in range(k):
            out = out * mult + th[i:n - k + 1 + i]
        out = splitmix64(out)
    return np.unique(out)


_STR_CACHE: dict[tuple[str, int], int] = {}


def _str_hash(s: str, seed: int) -> np.uint64:
    key = (s, seed)
    got = _STR_CACHE.get(key)
    if got is None:
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = np.uint64(seed)
            mult = np.uint64(0x100000001B3)
            for x in b:  # tokens are short; cached per unique token
                h = (h ^ x) * mult
        got = int(splitmix64(h))
        if len(_STR_CACHE) < 1_000_000:
            _STR_CACHE[key] = got
    return np.uint64(got)


def shingles_df(df: DataFrame, k: int = 3, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle bigint) — distinct k-shingle hashes per doc."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sh = [], []
            for d, t in zip(pdf[id_col], pdf[text_col]):
                h = _shingle_hashes(t, k)
                ids.extend([d] * h.size)
                sh.append(h.view(np.int64))
            yield pd.DataFrame({
                "doc_id": pd.array(ids, dtype="int64"),
                "shingle": np.concatenate(sh) if sh else
                np.zeros(0, dtype=np.int64)})
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
    n = F.size(toks)
    sh = F.array_distinct(F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1)
                                     for j in range(k)])))
    return (df.filter(F.size(tokens_col(text_col)) >= k)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(sh).alias("shingle")))


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
    h_i(s) = splitmix64(s XOR seed_i); one vectorized (shingles × hashes)
    min-reduce per doc."""
    seeds = splitmix64(np.arange(num_hashes, dtype=np.uint64)
                       + np.uint64(seed) * np.uint64(0x9E3779B9))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for d, t in zip(pdf[id_col], pdf[text_col]):
                sh = _shingle_hashes(t, k)
                if sh.size == 0:
                    sig = np.full(num_hashes, np.iinfo(np.int64).max,
                                  dtype=np.int64)
                else:
                    with np.errstate(over="ignore"):
                        m = splitmix64(sh[:, None] ^ seeds[None, :])
                    sig = m.min(axis=0).view(np.int64)
                ids.append(d)
                sigs.append(sig.tolist())
            yield pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                                "sig": sigs})
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen, schema="doc_id long, sig array<long>")


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = 16,
                        rows_per_band: int = 4) -> DataFrame:
    """Band the signatures and equi-join on (band, band_hash) buckets —
    the all-pairs-free near-dup candidate generation that scales."""
    b = sig_df.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.xxhash64(F.slice(
                "sig", i * rows_per_band + 1, rows_per_band).cast("string"))
        )).alias("band", "band_hash"))
    x, y = b.alias("x"), b.alias("y")
    return (x.join(y, (F.col("x.band") == F.col("y.band"))
                   & (F.col("x.band_hash") == F.col("y.band_hash"))
                   & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("id_a"),
                    F.col("y.doc_id").alias("id_b"))
            .distinct())


def minhash_jaccard_estimate(sig_df: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard = matching signature positions / num_hashes."""
    sa = sig_df.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sig", "sig_a")
    sb = sig_df.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sig", "sig_b")
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
    """(doc_id, simhash bigint): 64-bit SimHash over token hashes weighted by
    term frequency."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, out = [], []
            for d, t in zip(pdf[id_col], pdf[text_col]):
                toks = whitespace_tokens(ascii_fold(t or ""))
                if not toks:
                    ids.append(d)
                    out.append(0)
                    continue
                uniq, counts = np.unique(np.array(toks, dtype=object),
                                         return_counts=True)
                th = np.fromiter((_str_hash(s, seed) for s in uniq),
                                 dtype=np.uint64, count=len(uniq))
                bits = ((th[:, None] >> bit_idx[None, :]) & np.uint64(1)
                        ).astype(np.float64)
                acc = ((2.0 * bits - 1.0) * counts[:, None]).sum(axis=0)
                sh = np.uint64(0)
                for j in np.flatnonzero(acc > 0):
                    sh |= np.uint64(1) << np.uint64(j)
                ids.append(d)
                out.append(int(sh.view(np.int64) if hasattr(sh, "view")
                               else sh))
                out[-1] = int(np.uint64(sh).astype(np.int64))
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

def embedding_dup_pairs(emb_df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine-similarity ≥ threshold pairs (brute self-join — correct
    baseline; use ann.lsh_bucketed_join for the scale path)."""
    dot = F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda side: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(f"{side}.v"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x))
    base = emb_df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).cast("array<double>").alias("v"))
    a, b = base.alias("a"), base.alias("b")
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    (dot / (norm("a") * norm("b"))).alias("cosine"))
            .filter(F.col("cosine") >= threshold))
