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

from .analysis import ANALYZERS, ascii_fold
from .oracle import B, K1, idf as idf_fn

__all__ = ["match_scores", "top_hits_agg", "top_hits_scored_agg",
           "top_hits_scored_sql", "adjacency_matrix_agg",
           "diversified_sampler"]


def match_scores(index, query, *, mode: str = "OR",
                 quantize: int | None = None) -> DataFrame:
    """Relational full-match BM25 over the term-pruned posting streams:
    EVERY matching doc's (doc_id, n_matched, score) — not a top-k. The
    ``terms_set``/``explain``/``top_hits_scored`` kernel factored once:
    tf agg on the pruned posting scan, broadcast idf/avgdl literals,
    per-doc static sorted-grid coalesce-0 fold (ascending (term, field)
    order — bit-identical to ``search()``'s kernel scores), AND gate on
    the distinct-match count. Cost is MATCH-bounded downstream of the
    posting scan; output is one row per matching doc. Consumers that
    aggregate scores per group (block join, sampler) should quantize to
    integer codes first so the group fold is order-independent."""
    tok, _ = ANALYZERS[index.analyzer]
    qterms = sorted({ascii_fold(t) for q in (
        [query] if isinstance(query, str) else query) for t in tok(q)})
    if not qterms:
        raise ValueError("match_scores needs >= 1 analyzable term")
    stats = index.term_stats(qterms)
    present = sorted(t for t in qterms if t in stats)
    spark = index.spark
    empty = spark.createDataFrame(
        [], "doc_id long, n_matched int, score double")
    if not present or (mode == "AND" and len(present) < len(qterms)):
        return empty

    hits = index.find_all(present)
    tf = (hits.groupBy("doc_id", "term", "field")
          .agg(F.count("*").alias("tf")))
    dl = (index.docs.select("doc_id",
                            F.posexplode("dls").alias("field", "dl")))
    grid = sorted((t, int(f)) for t in present for f in stats[t])
    idf_df = spark.createDataFrame(
        [(t, f, float(idf_fn(index.n_docs, stats[t][f]["df"])))
         for t, f in grid], "term string, field int, widf double")
    favg = spark.createDataFrame(
        [(int(f), float(a)) for f, a in sorted(index.field_avgdl.items())],
        "field int, avgdl double")
    j = (tf.join(F.broadcast(idf_df), ["term", "field"])
         .join(F.broadcast(favg), "field")
         .join(dl, ["doc_id", "field"]))
    tfd, dld = F.col("tf").cast("double"), F.col("dl").cast("double")
    part = (tfd * F.lit(K1 + 1.0)
            / (tfd + F.lit(K1) * ((F.lit(1.0) - F.lit(B))
                                  + (F.lit(B) * dld) / F.col("avgdl"))))
    contrib = j.select("doc_id", "term", "field",
                       (F.col("widf") * part).alias("c"))
    pv = contrib.groupBy("doc_id").agg(
        *[F.sum(F.when((F.col("term") == t) & (F.col("field") == f),
                       F.col("c"))).alias(f"c{i}")
          for i, (t, f) in enumerate(grid)],
        F.count_distinct("term").cast("int").alias("n_matched"))
    score = None
    for i in range(len(grid)):
        c = F.coalesce(F.col(f"c{i}"), F.lit(0.0))
        score = c if score is None else score + c
    scored = pv.select("doc_id", "n_matched", score.alias("score"))
    if mode == "AND":
        scored = scored.filter(F.col("n_matched") == len(present))
    if quantize:
        qm = float(10 ** quantize)
        scored = scored.withColumn(
            "score", F.floor(F.col("score") * qm) / qm)
    return scored


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


def top_hits_scored_agg(index, corpus: DataFrame, query, group_col: str,
                        *, n: int = 3, mode: str = "OR",
                        quantize: int | None = 4,
                        id_col: str = "doc_id") -> DataFrame:
    """``top_hits`` ordered by ``_score`` — the ES DEFAULT sort inside
    the bucket: per-``group_col``, the ``n`` best-matching docs by the
    full BM25 sum. Relational full-match scoring over the term-pruned
    posting streams (the ``terms_set``/``explain`` precedent: per-doc
    static sorted-grid coalesce-0 fold, bit-identical to ``search()``'s
    kernel scores), joined to the group projection, ONE window shuffle
    on the group key, rank <= n. Every stage downstream of the posting
    scan is MATCH-bounded; output is groups x n. Ranking uses the
    floor-quantized score (doc-id tie-break) so the DuckDB twin
    reproduces rank and values hash-exactly."""
    if n <= 0:
        raise ValueError("n must be positive")
    scored = match_scores(index, query, mode=mode, quantize=quantize)
    g = corpus.select(F.col(id_col).alias("doc_id"),
                      F.col(group_col).cast("string").alias("group"))
    w = Window.partitionBy("group").orderBy(F.desc("score"),
                                            F.asc("doc_id"))
    return (scored.join(g, "doc_id")
            .withColumn("hit_rank", F.row_number().over(w))
            .filter(F.col("hit_rank") <= n)
            .select("group", "doc_id", "score", "hit_rank"))


def top_hits_scored_sql(src: str, terms: list[str], group_expr: str,
                        *, n: int = 3, mode: str = "OR",
                        quantize: int = 4, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of ``top_hits_scored_agg`` (single-field corpus):
    same tf/df/dl/idf expressions and sorted-term coalesce-0 static sum
    as ``terms_set_sql``, quantized BEFORE the per-group rank, same
    tie-break, same cut."""
    up, lo = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
              "abcdefghijklmnopqrstuvwxyz")
    ws = r"[ \t\n\r\f\v]+"
    qs = sorted({t.lower() for t in terms})
    tlist = ", ".join(f"'{t}'" for t in qs)
    sums = " + ".join(
        f"coalesce(sum(CASE WHEN term = '{t}' THEN c END), 0.0)"
        for t in qs)
    and_gate = (f"WHERE n_matched = {len(qs)}" if mode == "AND" else "")
    qm = float(10 ** quantize)
    return f"""
WITH ptok AS (
  SELECT {id_col} AS doc_id, translate(unnest(toks), '{up}', '{lo}') AS term
  FROM (SELECT {id_col},
               list_filter(regexp_split_to_array(coalesce({text_col}, ''),
                                                 '{ws}'), x -> x <> '') AS toks
        FROM {src})
),
dls AS (
  SELECT d.{id_col} AS doc_id, coalesce(x.dl, 0) AS dl
  FROM {src} d LEFT JOIN (
    SELECT doc_id, count(*) AS dl FROM ptok GROUP BY doc_id) x
    ON x.doc_id = d.{id_col}
),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dls
),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM ptok
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
contrib AS (
  SELECT tfs.doc_id, tfs.term,
         ln(1 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
         * (tfs.tf * {K1 + 1.0!r} / (tfs.tf + {K1!r} *
            ({1.0 - B!r} + ({B!r} * dls.dl) / stats.avgdl))) AS c
  FROM tfs JOIN dfs USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats
),
pv AS (
  SELECT doc_id, CAST(count(DISTINCT term) AS INT) AS n_matched,
         {sums} AS score
  FROM contrib GROUP BY doc_id
),
sc AS (
  SELECT doc_id, floor(score * {qm!r}) / {qm!r} AS score
  FROM pv {and_gate}
),
r AS (
  SELECT CAST({group_expr} AS VARCHAR) AS "group", sc.doc_id, sc.score,
         CAST(row_number() OVER (
           PARTITION BY {group_expr}
           ORDER BY sc.score DESC, sc.doc_id ASC) AS INT) AS hit_rank
  FROM sc JOIN {src} d ON d.{id_col} = sc.doc_id
)
SELECT "group", doc_id, score, hit_rank FROM r
WHERE hit_rank <= {n} ORDER BY "group", hit_rank"""


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


def diversified_sampler(index, corpus: DataFrame, query, dedup_col: str,
                        *, max_docs_per_value: int = 1, mode: str = "OR",
                        quantize: int = 4,
                        id_col: str = "doc_id") -> DataFrame:
    """ES ``diversified_sampler`` aggregation: the match set capped at
    ``max_docs_per_value`` docs per ``dedup_col`` value — the BEST docs
    by score win each key's slots — so downstream sub-aggregations
    (significant terms, term counts) aren't dominated by one hot key
    (the de-biasing use ES built it for; per-domain capping of a result
    sample is the web-search instance). Returns every sampled row as
    (key, doc_id, score, dup_rank), dup_rank 1-based within the key.

    Shape: ``match_scores`` (match-bounded relational BM25) joins the
    dedup projection, ONE window shuffle partitioned by the dedup key
    ranks within each key, rank <= cap. Output is <= keys x cap rows.
    Scores are floor-quantized BEFORE the rank (doc-id tie-break) so a
    DuckDB ``row_number()`` twin reproduces rank and rows hash-exactly.

    Reference analogue: none (fates has no aggregations) — target-new,
    ES ``diversified_sampler``.
    """
    if max_docs_per_value <= 0:
        raise ValueError("max_docs_per_value must be positive")
    scored = match_scores(index, query, mode=mode, quantize=quantize)
    keys = corpus.select(F.col(id_col).alias("doc_id"),
                         F.col(dedup_col).cast("string").alias("key"))
    w = Window.partitionBy("key").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.join(keys, "doc_id")
            .withColumn("dup_rank", F.row_number().over(w))
            .filter(F.col("dup_rank") <= max_docs_per_value)
            .select("key", "doc_id", "score", "dup_rank"))
