"""ES bucket aggregations over the match set: ``top_hits`` and
``adjacency_matrix``.

``top_hits_agg`` — the ES ``terms`` agg with a ``top_hits`` sub-agg
("per source/domain/language, the n best matching docs by X"): the
unscored match set (``SearchIndex.matching_docs`` — doc-id streams only,
bucket-local distinct, no global shuffle) equi-joins the corpus
projection, then ONE window shuffle on the group key ranks within each
group and keeps ``rank <= n``. Output is ``n_groups x n`` rows no matter
the match-set size — the agg's scale contract. Skewed groups cost one
partition's sort bounded by the hottest group (AQE skew split applies);
there is no global sort and no driver-side pass. The sort key is a
STORED column (ES ``sort`` inside top_hits); the deterministic tie-break
is doc_id, so a DuckDB ``row_number()`` twin reproduces the rows
hash-exactly.

``adjacency_matrix_agg`` — the ES ``adjacency_matrix`` agg: named filters
A, B, C... produce one bucket per filter (doc count) and one per
intersecting PAIR (``A&B``-style keys, ES's own key syntax). Shape: each
filter's match set is the same doc-id-stream scan as above tagged with
its name; the union groups by doc_id (doc-disjoint buckets keep this one
map-side-combinable shuffle) into a per-doc name list, pairs explode from
that list (bounded: <= len(filters)^2 per doc), and a count agg over
single names + pairs emits the matrix. Nothing corpus-sized is ever
collected; the output is <= f + f*(f-1)/2 rows.

Reference analogue: none (fates has no aggregations) — target-new, the
ES aggregation serving surface next to ``composite.py`` / ``hll``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["top_hits_agg", "adjacency_matrix_agg"]


def top_hits_agg(index, corpus: DataFrame, query, group_col: str,
                 sort_col: str, *, n: int = 3, mode: str = "OR",
                 ascending: bool = False,
                 id_col: str = "doc_id") -> DataFrame:
    """Per-``group_col`` top-``n`` matching docs ordered by a stored
    ``sort_col`` (module docstring). Returns
    (group, doc_id, <sort_col>, hit_rank) — hit_rank 1-based within the
    group."""
    if n <= 0:
        raise ValueError("n must be positive")
    m = index.matching_docs(query, mode=mode)
    j = corpus.select(F.col(id_col).alias("doc_id"),
                      F.col(group_col).alias("group"),
                      F.col(sort_col)).join(m, "doc_id")
    order = [F.asc(sort_col) if ascending else F.desc(sort_col),
             F.asc("doc_id")]
    w = Window.partitionBy("group").orderBy(*order)
    return (j.withColumn("hit_rank", F.row_number().over(w))
            .filter(F.col("hit_rank") <= n)
            .select("group", "doc_id", sort_col, "hit_rank"))


def adjacency_matrix_agg(index, filters: dict[str, object],
                         mode: str = "OR") -> DataFrame:
    """ES adjacency_matrix buckets: (key, doc_count) for every named
    filter and every non-empty pairwise intersection, key = ``a`` or
    ``a&b`` with names in sorted order (the ES separator)."""
    if not filters:
        raise ValueError("at least one named filter required")
    tagged = None
    for name in sorted(filters):
        m = index.matching_docs(filters[name], mode=mode) \
            .withColumn("name", F.lit(name))
        tagged = m if tagged is None else tagged.unionByName(m)
    per_doc = tagged.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("name")).alias("names"))
    singles = per_doc.select(F.explode("names").alias("key"))
    # all ordered pairs (i < j) from the per-doc name list
    pairs = per_doc.select(
        F.explode(F.filter(
            F.flatten(F.transform(
                "names",
                lambda a, i: F.transform(
                    "names",
                    lambda b, j: F.when(i < j, F.concat_ws("&", a, b))))),
            lambda x: x.isNotNull())).alias("key"))
    return (singles.unionByName(pairs)
            .groupBy("key").agg(F.count(F.lit(1)).alias("doc_count")))
