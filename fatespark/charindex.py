"""Char-granular substring position lookup — the reference's actual core
data structure (a suffix array over the corpus text,
``lib/suffix_array.rb`` / ``lib/suffix_array_reader.rb:127-137``),
re-expressed Spark-first.

The reference binary-searches a suffix array to find every BYTE position
where a pattern occurs — including positions that cross token boundaries,
which no token-granular inverted index can serve. The Spark-native
analogue of "suffix array sorted by prefix" is a **k-char prefix position
table**: one row per character position, keyed by the next ``k`` folded
characters. Lookup probes the pattern's k-prefix (an equi-join / pushed
filter instead of the binary search) and verifies the full pattern with
one ``substring`` comparison per candidate.

Size honesty: corpus-char-scale rows — the same asymptotics as the
suffix array it replaces (the reference stores 4 bytes/position plus the
text; this stores the position plus a k-char key that dictionary-encodes
well in parquet). ``k`` trades index width for probe selectivity: with
k=8 over ~40-char effective alphabet, a full bucket scan per probe
touches ~N/40^8 of the corpus — selectivity far beyond what any realistic
pattern needs.

Scale shape:
- build: positions explode NARROW (ints after the fold — the Generate
  discipline: the substring key is computed on the emitted row, never
  inside an exploded transform); the persisted variant buckets by
  ``crc32(key) % n_buckets`` via ``partitionBy`` so a probe physically
  prunes to one directory, and sorts by key within files for row-group
  skipping — the same layout recipe as ``LshVectorIndex`` and the fuzzy
  variants table.
- probe: candidates = one bucket's key-equality rows; verification joins
  the docs table on doc_id and checks
  ``substring(folded_text, pos, len(P)) == fold(P)`` JVM-side. Results
  are (doc_id, pos) — 1-based char positions in the FOLDED text (same
  length as the original: ASCII fold is a translate).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .textops import fold_col


def char_positions_df(df: DataFrame, k: int = 8, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, key): every 1-based char position of the folded text
    with its k-char forward key (shorter near the end — suffixes shorter
    than the pattern can still match a short pattern)."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     fold_col(F.coalesce(F.col(text_col), F.lit("")))
                     .alias("_ft"))
    return (base.filter(F.length("_ft") >= 1)
            .select("doc_id", "_ft",
                    F.explode(F.expr("sequence(1, length(_ft))"))
                    .alias("pos"))
            .select("doc_id", "pos",
                    F.expr(f"substring(_ft, pos, {k})").alias("key")))


def substr_find(df: DataFrame, pattern: str, k: int = 8,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """All (doc_id, pos) occurrences of ``pattern`` (ASCII-folded, like
    the reference's case-insensitive suffix lookup) in the corpus —
    including occurrences crossing token boundaries. Ad-hoc scan path:
    derives the position table inline; see ``CharIndex`` for the
    persisted probe."""
    from .analysis import ascii_fold
    p = ascii_fold(pattern)
    if not p:
        raise ValueError("empty pattern")
    # a pattern of >= k chars pins a full key (equality); shorter patterns
    # prefix-match the key — same widening the reference's suffix-array
    # range search does for short patterns
    pos = char_positions_df(df, k, text_col, id_col)
    if len(p) >= k:
        cand = pos.filter(F.col("key") == F.lit(p[:k]))
    else:
        cand = pos.filter(
            F.expr(f"substring(key, 1, {len(p)})") == F.lit(p))
    if len(p) <= k:
        return cand.select("doc_id", "pos")
    docs = df.select(F.col(id_col).alias("doc_id"),
                     fold_col(F.coalesce(F.col(text_col), F.lit("")))
                     .alias("_ft"))
    return (cand.join(docs, "doc_id")
            .filter(F.expr(f"substring(_ft, pos, {len(p)})")
                    == F.lit(p))
            .select("doc_id", "pos"))


class CharIndex:
    """Persisted k-prefix position table: ``build`` once, probe many.
    Layout: partitionBy(kbucket = crc32(key) % n_buckets), key-sorted
    within files — probes prune to one directory (PartitionFilters) and
    skip row groups on the pushed key filter."""

    META = "charindex_meta.json"

    def __init__(self, index_dir: str):
        import json
        with open(os.path.join(index_dir, self.META)) as f:
            m = json.load(f)
        self.index_dir = index_dir
        self.k = int(m["k"])
        self.n_buckets = int(m["n_buckets"])

    @staticmethod
    def build(df: DataFrame, index_dir: str, k: int = 8,
              n_buckets: int = 64, text_col: str = "text",
              id_col: str = "doc_id") -> "CharIndex":
        import json
        pos = (char_positions_df(df, k, text_col, id_col)
               .withColumn("kbucket",
                           F.pmod(F.crc32(F.encode(F.col("key"), "utf-8")),
                                  F.lit(n_buckets)).cast("int")))
        (pos.repartition("kbucket")
            .sortWithinPartitions("key", "doc_id", "pos")
            .write.mode("overwrite").partitionBy("kbucket")
            .parquet(os.path.join(index_dir, "positions")))
        with open(os.path.join(index_dir, CharIndex.META), "w") as f:
            json.dump({"k": k, "n_buckets": n_buckets}, f)
        return CharIndex(index_dir)

    def find(self, spark, docs: DataFrame, pattern: str,
             text_col: str = "text", id_col: str = "doc_id",
             tombstones=None) -> DataFrame:
        """(doc_id, pos) occurrences via the persisted table; ``docs`` is
        only consulted to verify patterns longer than k.

        ``tombstones`` keeps the persisted position table consistent with
        an index's delete lifecycle: pass a ``query.SearchIndex`` (its
        pending-delete set is used directly), or any iterable / ndarray of
        deleted doc_ids. Matches in tombstoned docs are excluded on BOTH
        probe paths (<= k chars — which never touches ``docs`` — and the
        verified > k path): an IN-list filter below
        ``query.TOMBSTONE_BROADCAST_ROWS`` ids (pushable), a broadcast
        anti-join above it — the same split the posting scorers use.
        After ``IndexBuilder.vacuum`` the doc_ids are re-used physical
        rows, so rebuild this index at vacuum like the postings are."""
        import zlib

        from .analysis import ascii_fold
        p = ascii_fold(pattern)
        if not p:
            raise ValueError("empty pattern")
        tbl = spark.read.parquet(os.path.join(self.index_dir, "positions"))
        tbl = self._drop_tombstoned(spark, tbl, tombstones)
        if len(p) >= self.k:
            # full key -> one kbucket directory (PartitionFilters prune)
            kb = zlib.crc32(p[: self.k].encode("utf-8")) % self.n_buckets
            cand = tbl.filter((F.col("kbucket") == kb)
                              & (F.col("key") == F.lit(p[: self.k])))
        else:
            # short pattern: bucket is a hash of the FULL key, so no
            # directory pruning — key-prefix filter still row-group-skips
            # (files are key-sorted), mirroring the reference's widened
            # suffix range for short patterns
            cand = tbl.filter(
                F.expr(f"substring(key, 1, {len(p)})") == F.lit(p))
        if len(p) <= self.k:
            return cand.select("doc_id", "pos")
        dd = docs.select(F.col(id_col).alias("doc_id"),
                         fold_col(F.coalesce(F.col(text_col), F.lit("")))
                         .alias("_ft"))
        return (cand.join(dd, "doc_id")
                .filter(F.expr(f"substring(_ft, pos, {len(p)})")
                        == F.lit(p))
                .select("doc_id", "pos"))

    @staticmethod
    def _drop_tombstoned(spark, tbl: DataFrame, tombstones) -> DataFrame:
        """Filter pending-delete doc_ids out of the candidate stream."""
        if tombstones is None:
            return tbl
        t = getattr(tombstones, "tombstones", tombstones)  # SearchIndex?
        if t is None:
            return tbl
        import numpy as np

        from .query import TOMBSTONE_BROADCAST_ROWS
        ids = np.asarray(t, dtype=np.int64)
        if ids.size == 0:
            return tbl
        if ids.size <= TOMBSTONE_BROADCAST_ROWS:
            return tbl.filter(~F.col("doc_id").isin(
                [int(x) for x in ids]))
        dead = spark.createDataFrame(
            pd.DataFrame({"doc_id": ids}), "doc_id long")
        return tbl.join(F.broadcast(dead), "doc_id", "left_anti")
