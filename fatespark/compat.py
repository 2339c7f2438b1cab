"""Reference-API veneer: the fates public surface over the Spark engine.

A user of the reference drives it through three calls (``lib/fates.rb``):

    Model.fulltext_index(...)                 -> build       (:86-106)
    Model.fulltext_count(query)               -> hit count   (:48-51)
    Model.fulltext_find(query, offset, limit) -> ranked rows (:53-84)

``FatesIndex`` reproduces that surface with fates' SUFFIX semantics — every
query is a byte-prefix match from token starts, so ``'fa'`` matches faq/fat/
fat_entry and ``'big arr'`` matches ``'big array'`` (``README.markdown:
7-11``) — while the ranking upgrades the reference's weight-sum scoring to
weighted per-field BM25 per the north rule. ``fulltext_find`` returns
``[primary_key, [field values...], score]`` rows exactly like the reference
(score 0.0 rows when ranking is disabled, ``lib/fates.rb:73-81``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import ANALYZERS, ascii_fold
from .build import BuildConfig, IndexBuilder
from .query import SearchIndex

DEFAULT_WEIGHT = 100000.0  # the reference's per-field default, lib/fates.rb:65


class FatesIndex:
    """fates' public API over a built index + its source corpus table."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 corpus: DataFrame | None = None,
                 id_col: str = "doc_id",
                 field_cols: list[str] | None = None,
                 weights: list[float] | None = None,
                 max_expansions: int = 64):
        self.idx = SearchIndex(spark, index_dir)
        self.corpus = corpus
        self.id_col = id_col
        self.field_cols = field_cols or []
        n = self.idx.n_fields
        self.weights = list(weights) if weights is not None \
            else [DEFAULT_WEIGHT] * n
        self.max_expansions = max_expansions

    # -- build (Model.fulltext_index, lib/fates.rb:86-106) -------------------
    @classmethod
    def fulltext_index(cls, spark: SparkSession, df: DataFrame,
                       index_dir: str, fields: list[str], *,
                       id_col: str, analyzers: list[str] | None = None,
                       weights: list[float] | None = None,
                       config: BuildConfig | None = None,
                       build_id: str = "fates") -> "FatesIndex":
        from dataclasses import replace
        cfg = replace(config) if config is not None else BuildConfig()
        if analyzers is not None:
            cfg.analyzers = list(analyzers)  # fresh copy: caller's config untouched
        IndexBuilder(index_dir, cfg).build(
            spark, df, id_col=id_col, url_col=id_col, text_cols=fields,
            build_id=build_id)
        return cls(spark, index_dir, corpus=df, id_col=id_col,
                   field_cols=fields, weights=weights)

    # -- count (Model.fulltext_count, lib/fates.rb:48-51) --------------------
    def fulltext_count(self, query: str) -> int:
        """Suffix-hit count: occurrences of the query as a byte prefix from
        token starts — single tokens match as prefixes (EXACT and uncapped
        via the terms-table aggregation), multi-token queries as phrases
        with the last token a prefix (dictionary expansion capped at
        ``max_expansions`` — raise it for exhaustive counts over wide
        vocabularies)."""
        return self.idx.count_phrase(query, prefix=True,
                                     max_expansions=self.max_expansions)

    # -- find (Model.fulltext_find, lib/fates.rb:53-84) ----------------------
    def fulltext_find_df(self, query: str, offset: int = 0,
                         limit: int = 10,
                         quantize: int | None = None) -> DataFrame | None:
        """DataFrame twin of ``fulltext_find``: the ranked (doc_id, score)
        window the list API collects, kept LAZY — the surface a driver
        verifies at scale without materializing field values. None when
        the query analyzes to nothing."""
        tok, _ = ANALYZERS[self.idx.analyzer]
        terms = [ascii_fold(t) for t in tok(ascii_fold(query))]
        if not terms:
            return None
        if len(terms) == 1:
            expanded = self.idx.expand_prefix(terms[0],
                                              self.max_expansions)
            if not expanded:
                return None
            return self.idx.search(expanded, k=limit, offset=offset,
                                   mode="OR", weights=self.weights,
                                   quantize=quantize)
        return self.idx.search_phrase_prefix(
            query, k=limit, offset=offset,
            max_expansions=self.max_expansions,
            weights=self.weights, quantize=quantize)

    def fulltext_find(self, query: str, offset: int = 0, limit: int = 10,
                      ranked: bool = True) -> list[list]:
        """Ranked (or raw) window of matches: ``[[pk, [fields...], score],
        ...]``. Ranked mode is weighted per-field BM25 over the prefix
        expansion; unranked mirrors the reference's score-0 rows."""
        res = self.fulltext_find_df(query, offset=offset, limit=limit)
        if res is None:
            return []
        rows = res.collect()
        fields_of = self._fields_of([r["doc_id"] for r in rows])
        return [[r["doc_id"], fields_of.get(r["doc_id"], []),
                 float(r["score"]) if ranked else 0.0] for r in rows]

    # -- per-hit enumeration (SuffixArrayReader#find_all -> Hits,
    # lib/suffix_array_reader.rb:127-137; Hit#context :19-36) --------------
    def find_hits(self, query: str, context_size: int | None = None,
                  text_col: str = "text") -> DataFrame:
        """Every individual hit location as a lazy DataFrame
        (doc_id, field, term, position[, context]) — the reference's
        ``Hits`` enumeration. Positions are token-indexed (the engine's
        addressing unit; the reference's are byte offsets into its single
        fulltext stream). ``context_size`` adds ±N tokens of surrounding
        raw text per hit, the ``Hit#context`` analogue; requires the source
        ``corpus``. On a multi-field index each hit's context comes from
        ITS field's column (positions index per-field token streams)."""
        hits = self.idx.find_all(query)
        if context_size is None:
            return hits
        if self.corpus is None:
            raise ValueError("context requires the source corpus DataFrame")
        from functools import reduce

        from .query import hit_contexts
        if self.field_cols:
            docs = reduce(lambda a, b: a.unionByName(b), [
                self.corpus.select(
                    F.col(self.id_col).alias("doc_id"),
                    F.lit(i).cast("int").alias("field"),
                    F.col(c).cast("string").alias("text"))
                for i, c in enumerate(self.field_cols)])
        else:
            docs = self.corpus.select(F.col(self.id_col).alias("doc_id"),
                                      F.col(text_col).alias("text"))
        return hit_contexts(hits, docs, size=context_size)

    def _fields_of(self, doc_ids: list[int]) -> dict[int, list]:
        if self.corpus is None or not doc_ids or not self.field_cols:
            return {}
        rows = (self.corpus
                .filter(F.col(self.id_col).isin([int(d) for d in doc_ids]))
                .select(self.id_col, *self.field_cols).collect())
        return {r[self.id_col]: [r[c] for c in self.field_cols]
                for r in rows}
