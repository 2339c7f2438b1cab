"""Web link graph: href/anchor extraction from page markup and an
integer-exact PageRank — the web-graph tier of the ingest pipeline
(crawl frontier priority, spam demotion, quality priors for the
training-data mix all consume these ranks; the reference indexes flat
records — ``lib/fates.rb:23-31`` — so the graph layer is an engine
extension, not a port).

Extraction (``extract_links``) is a pure-JVM regexp chain like
``htmlx``: full ``<a href="...">...</a>`` matches via
``regexp_extract_all`` then one narrow explode; href and anchor are
per-match group extracts; the anchor inner markup is stripped with the
same tag->space / entity / whitespace rules the page extractor uses.
Zero shuffles; runs in the scan stage.

PageRank (``pagerank``) is FIXED-POINT INTEGER arithmetic throughout:
ranks are int64 in units of ``1/scale``; every divide is integral
(Spark ``div`` == DuckDB ``//`` on non-negative operands) and every
sum is an int64 sum — so the result is EXACTLY reproducible regardless
of partitioning, agg order, or engine (float PageRank is
order-of-summation dependent and can never be hash-compared across
engines). The recurrence, per node v with in-edges E(v), damping
``num/den`` and ``N`` nodes::

    base        = ((den - num) * scale) div den
    contrib(v)  = sum over (u,v) in E of  rank(u) div outdeg(u)
    share       = (sum of rank over dangling nodes) div N
    rank'(v)    = base + (num * (contrib(v) + share)) div den

Floor losses strictly shrink total mass (bounded by one unit per
divide), never grow it; ``sum(rank) <= N*scale`` is an invariant, so
``num * (contrib + share) <= num * N * scale`` bounds the widest
intermediate — ``scale`` must satisfy ``den * N * scale < 2**63``.
The default (``scale=None``) computes the safe maximum ``2**62 //
(den*N)`` from the node count (``_auto_scale``; the SQL twin derives
the identical value in-query), good to N ~ 10**9; a trillion-node
graph needs decimal(38,0) columns instead of int64.

Scale shape: edges are hash-partitioned by ``src`` ONCE and
checkpointed; each iteration is one partition-local join on src (the
exchange is reused) plus one shuffle of contributions by dst — the
minimal movement a power iteration admits. The dangling-node set is
computed once; its per-iteration mass is a single bounded agg. Lineage
is cut every iteration via localCheckpoint (the ``dedup.py:544``
connected-components pattern). Head skew (every page linking "home")
lands in the contribution agg, which is map-side combinable; AQE
handles the residual join skew.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, functions as F

# anchor tag: double-quoted href (the deterministic-fixture contract;
# single-quoted/unquoted attrs are real-web noise out of scope), inner
# markup allowed, non-greedy to the matching close. No backreferences or
# lookaround: the Java and RE2 (DuckDB) engines run the same pattern text.
LINK_RE = '(?is)<a\\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def _clean_anchor(c: Column) -> Column:
    """Anchor inner markup -> text: tag strip, the htmlx entity decode
    (&amp; last), whitespace collapse + trim."""
    from fatespark.htmlx import ENTITIES
    h = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in ENTITIES:
        h = F.replace(h, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(h, "[ \t\r\n\f]+", " "))


def extract_links(pages: DataFrame, html_col: str = "html",
                  src_col: str = "url") -> DataFrame:
    """One row per ``<a href="...">`` occurrence: (``src_col``,
    ``dst_url``, ``anchor``). Binary html is decoded as UTF-8. The
    explode emits the raw matched tag (a cheap scalar) and group
    extraction happens on the emitted row — the Generate-re-evaluation
    rule every explode in this repo follows."""
    h = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        h = F.decode(h, "UTF-8")
    tags = F.regexp_extract_all(h, F.lit(LINK_RE), 0)
    out = pages.select(src_col, F.explode(tags).alias("_tag"))
    return out.select(
        src_col,
        F.regexp_extract("_tag", LINK_RE, 1).alias("dst_url"),
        _clean_anchor(F.regexp_extract("_tag", LINK_RE, 2)).alias("anchor"))


@contextmanager
def _aqe_coalesce(df: DataFrame):
    """Scope AQE post-shuffle coalescing over an iterative graph loop.

    The session default disables coalescing because the BUILD's python
    merge stage wants even fixed-width packing (session.py rationale).
    The graph loops are the opposite case: 10+ small checkpoint jobs per
    run whose aggregation shuffles carry node-table-sized data — at 200k
    nodes the fixed 4x-cores partition count is pure task overhead, and
    at 10^12 edges a FIXED count would be wrong in the other direction.
    AQE right-sizes each shuffle from observed bytes, which is the
    scale-correct behavior for both ends. Safe to scope here: every
    loop step materializes via an EAGER localCheckpoint while the flag
    is set; results are partitioning-invariant integer sums (module
    contract), so the flag can never change scores."""
    spark = df.sparkSession
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _auto_scale(n: int, den: int) -> int:
    """The largest overflow-safe scale: num*(contrib+share) is bounded
    by num*N*scale <= (num/den)*2**62 < 2**63. Found the hard way: at
    N=2M a 0.9N-in-edge hub overflowed the fixed 10**12 default (ANSI
    mode failed loudly, as designed). Past N ~ 10**9 the quotient gets
    coarse (< ~4600 units/node) — switch to decimal(38,0) columns for
    a trillion-node graph; int64 is the fast path below that."""
    return max((2 ** 62) // (den * n), 1)


def pagerank(edges: DataFrame, iterations: int = 5,
             damping_num: int = 85, damping_den: int = 100,
             scale: int | None = None) -> DataFrame:
    """Integer-exact PageRank over an edge list with columns
    (``src``, ``dst``); returns (``node``, ``rank``) with rank int64 in
    units of 1/``scale`` (initial mass: ``scale`` per node).
    ``scale=None`` (default) picks the overflow-safe maximum from the
    node count (``_auto_scale``) — pass an explicit scale only when
    units must be pinned across differently-sized graphs. Duplicate
    edges count twice (multigraph semantics — dedup upstream if not
    wanted). Deterministic bit-for-bit: see the module contract."""
    num, den = damping_num, damping_den
    with _aqe_coalesce(edges):
        edges = (edges.select(F.col("src").cast("long"),
                              F.col("dst").cast("long"))
                 .repartition("src").localCheckpoint(eager=True))
        nodes = (edges.select(F.col("src").alias("node"))
                 .union(edges.select(F.col("dst").alias("node")))
                 .distinct().localCheckpoint(eager=True))
        n = nodes.count()
        if n == 0:
            return nodes.withColumn("rank", F.lit(0).cast("long"))
        if scale is None:
            scale = _auto_scale(n, den)
        outdeg = (edges.groupBy("src").agg(F.count("*").alias("deg"))
                  .localCheckpoint(eager=True))
        dangling = (nodes.join(outdeg, nodes.node == outdeg.src,
                               "left_anti")
                    .localCheckpoint(eager=True))
        base = ((den - num) * scale) // den
        ranks = nodes.select("node",
                             F.lit(scale).cast("long").alias("rank"))
        for _ in range(iterations):
            dang = (dangling.join(ranks, "node")
                    .agg(F.sum("rank")).collect()[0][0]) or 0
            share = dang // n
            contribs = (edges
                        .join(ranks.withColumnRenamed("node", "src"),
                              "src")
                        .join(outdeg, "src")
                        .select(F.col("dst").alias("node"),
                                F.expr("rank div deg").alias("c"))
                        .groupBy("node")
                        .agg(F.sum("c").alias("contrib")))
            ranks = (nodes.join(contribs, "node", "left")
                     .select("node", (F.lit(base) + F.expr(
                         f"({num}L * (coalesce(contrib, 0L) + {share}L)) "
                         f"div {den}L")).alias("rank"))
                     .localCheckpoint(eager=True))
    return ranks


def pagerank_local(edge_list, iterations: int = 5, damping_num: int = 85,
                   damping_den: int = 100,
                   scale: int | None = None) -> dict:
    """Driver-local twin of ``pagerank`` (plain dict/loop), the test
    oracle: the identical integer recurrence with none of the
    distribution."""
    num, den = damping_num, damping_den
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    n = len(nodes)
    if n == 0:
        return {}
    if scale is None:
        scale = _auto_scale(n, den)
    outdeg: dict = {}
    for u, _ in edge_list:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = ((den - num) * scale) // den
    rank = {v: scale for v in nodes}
    for _ in range(iterations):
        dang = sum(rank[v] for v in nodes if v not in outdeg)
        share = dang // n
        contrib = {v: 0 for v in nodes}
        for u, v in edge_list:
            contrib[v] += rank[u] // outdeg[u]
        rank = {v: base + (num * (contrib[v] + share)) // den
                for v in nodes}
    return rank


def hits(edges: DataFrame, iterations: int = 5,
         cap_bits: int = 40) -> DataFrame:
    """Integer-exact HITS (Kleinberg hubs/authorities) over (``src``,
    ``dst``) edges -> (``node``, ``hub``, ``authority``) int64 scores.

    Classic HITS L2-normalizes each half-step — impossible to make
    bit-reproducible across engines. Instead each half-step divides by
    the integral cap divisor ``max(raw) div 2**cap_bits + 1``, which
    (a) keeps every score <= ~2**cap_bits so the next sum is bounded by
    ``deg_max * 2**(cap_bits+1)`` (cap_bits=40 is safe to deg_max ~2M
    on int64; drop cap_bits for hub-ier graphs), (b) preserves the
    score RATIOS up to one unit of integer truncation — the same
    fixed-point trade ``pagerank`` makes — and (c) is exactly
    reproducible: sums are int64 sums, the divisor derives from an
    exact max, and the SQL twin (``hits_sql``) runs the identical
    recurrence. Scores are therefore in arbitrary-but-fixed units;
    compare within a run, not across graphs. Scale shape per
    iteration: two edge joins + two map-side-combinable aggs + two
    bounded max scalars; the edges exchange is checkpointed once, and
    each half-step's raw sum table is checkpointed BEFORE its divisor
    max is collected, so the join+agg runs exactly once per half-step
    (the divisor scan and the score table both read the checkpoint
    rather than recomputing the join)."""
    cap = 2 ** cap_bits
    with _aqe_coalesce(edges):
        return _hits_loop(edges, iterations, cap)


def _hits_loop(edges: DataFrame, iterations: int, cap: int) -> DataFrame:
    edges = (edges.select(F.col("src").cast("long"),
                          F.col("dst").cast("long"))
             .repartition("src").localCheckpoint(eager=True))
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    if nodes.count() == 0:
        return nodes.select("node", F.lit(0).alias("hub"),
                            F.lit(0).alias("authority"))
    # The recurrence never needs zero-score rows: a node absent from a
    # half-step's sum table contributes exactly 0 to the next sum either
    # way (0 div d = 0), and divisor maxima are unchanged (raw sums are
    # non-negative). So the loop carries only the NONZERO score tables —
    # two join+agg checkpoint jobs and two bounded max scalars per
    # iteration — and the all-nodes left-join runs ONCE at the end to
    # materialize zeros for sinks/sources.
    h = nodes.select("node", F.lit(cap).cast("long").alias("s"))
    a = None
    for _ in range(iterations):
        a_raw = (edges.join(h.withColumnRenamed("node", "src"), "src")
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("s").alias("raw"))
                 .localCheckpoint(eager=True))
        da = (a_raw.agg(F.max("raw")).collect()[0][0] or 0) // cap + 1
        a = a_raw.select("node", F.expr(f"raw div {da}L").alias("s"))
        h_raw = (edges.join(a.withColumnRenamed("node", "dst"), "dst")
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum("s").alias("raw"))
                 .localCheckpoint(eager=True))
        dh = (h_raw.agg(F.max("raw")).collect()[0][0] or 0) // cap + 1
        h = h_raw.select("node", F.expr(f"raw div {dh}L").alias("s"))
    return (nodes
            .join(h.withColumnRenamed("s", "hub"), "node", "left")
            .join(a.withColumnRenamed("s", "authority"), "node", "left")
            .select("node",
                    F.coalesce("hub", F.lit(0).cast("long")).alias("hub"),
                    F.coalesce("authority", F.lit(0).cast("long"))
                    .alias("authority")))


def hits_local(edge_list, iterations: int = 5,
               cap_bits: int = 40) -> dict:
    """Driver-local twin of ``hits``: identical integer recurrence."""
    cap = 2 ** cap_bits
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    if not nodes:
        return {}
    h = {v: cap for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iterations):
        a_raw = {v: 0 for v in nodes}
        for u, v in edge_list:
            a_raw[v] += h[u]
        da = (max(a_raw.values()) if a_raw else 0) // cap + 1
        a = {v: a_raw[v] // da for v in nodes}
        h_raw = {v: 0 for v in nodes}
        for u, v in edge_list:
            h_raw[u] += a[v]
        dh = (max(h_raw.values()) if h_raw else 0) // cap + 1
        h = {v: h_raw[v] // dh for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


def hits_sql(edges_cte: str, iterations: int = 5,
             cap_bits: int = 40) -> str:
    """DuckDB twin: unrolled CTE chain; final CTE ``hits_out`` is
    (node, hub, authority)."""
    cap = 2 ** cap_bits
    parts = [f"""
ht_nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM {edges_cte}
    UNION ALL SELECT dst FROM {edges_cte})),
ht_h0 AS MATERIALIZED (SELECT node, CAST({cap} AS BIGINT) AS s FROM ht_nodes)"""]
    for i in range(iterations):
        hp, ap, h2 = f"ht_h{i}", f"ht_a{i + 1}", f"ht_h{i + 1}"
        parts.append(f"""
ht_ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(sum(h.s) AS BIGINT) AS raw
  FROM {edges_cte} e JOIN {hp} h ON h.node = e.src GROUP BY e.dst),
ht_da{i} AS MATERIALIZED (
  SELECT coalesce(max(raw), 0) // {cap} + 1 AS d FROM ht_ar{i}),
{ap} AS MATERIALIZED (
  SELECT n.node,
         CAST(coalesce(r.raw, 0) // (SELECT d FROM ht_da{i}) AS BIGINT)
           AS s
  FROM ht_nodes n LEFT JOIN ht_ar{i} r ON r.node = n.node),
ht_hr{i} AS MATERIALIZED (
  SELECT e.src AS node, CAST(sum(a.s) AS BIGINT) AS raw
  FROM {edges_cte} e JOIN {ap} a ON a.node = e.dst GROUP BY e.src),
ht_dh{i} AS MATERIALIZED (
  SELECT coalesce(max(raw), 0) // {cap} + 1 AS d FROM ht_hr{i}),
{h2} AS MATERIALIZED (
  SELECT n.node,
         CAST(coalesce(r.raw, 0) // (SELECT d FROM ht_dh{i}) AS BIGINT)
           AS s
  FROM ht_nodes n LEFT JOIN ht_hr{i} r ON r.node = n.node)""")
    parts.append(f"""
hits_out AS (
  SELECT h.node, h.s AS hub, a.s AS authority
  FROM ht_h{iterations} h
  JOIN ht_a{iterations} a ON a.node = h.node)""")
    return ",".join(parts)


def resolve_redirects(redirects: DataFrame,
                      rounds: int = 16) -> DataFrame:
    """Resolve every redirect source to its terminal target by pointer
    DOUBLING: ``rounds`` self-joins reach chains up to ``2**rounds``
    hops (16 covers any real redirect chain; a crawl would cap far
    lower). ``redirects`` is (src, dst) with at most one dst per src
    (dedup upstream). Returns (src, final, hops, cyclic): rows whose
    walk never leaves the redirect map — a loop — get final=NULL,
    hops=NULL, cyclic=true, so loops are flagged, never mis-resolved.

    Deterministic for any rounds >= log2(longest acyclic chain):
    once a walk reaches a terminal (a node that is no source), further
    doubling rounds are identity for it, so Spark and the unrolled SQL
    twin agree regardless of extra rounds. Scale shape: each round is
    ONE equi-join of the map with itself on the moving pointer (the
    dd_clusters pointer-jump shape), lineage cut per round; O(log
    chain) rounds total, never O(chain)."""
    m = (redirects.select(F.col("src"), F.col("dst").alias("cur"),
                          F.lit(1).cast("long").alias("hops"))
         .localCheckpoint(eager=True))
    srcs = redirects.select("src").distinct().localCheckpoint(eager=True)
    for _ in range(rounds):
        b = m.select(F.col("src").alias("b_src"),
                     F.col("cur").alias("b_cur"),
                     F.col("hops").alias("b_hops"))
        m = (m.join(b, m.cur == b.b_src, "left")
             .select("src",
                     F.coalesce("b_cur", "cur").alias("cur"),
                     (F.col("hops") + F.coalesce("b_hops", F.lit(0)))
                     .alias("hops"))
             .localCheckpoint(eager=True))
    cyc = (m.join(srcs.withColumnRenamed("src", "cur"), "cur",
                  "left_semi").select("src")
           .withColumn("_c", F.lit(True)))
    return (m.join(cyc, "src", "left")
            .select("src",
                    F.when(F.col("_c").isNull(), F.col("cur"))
                    .alias("final"),
                    F.when(F.col("_c").isNull(), F.col("hops"))
                    .alias("hops"),
                    F.coalesce("_c", F.lit(False)).alias("cyclic")))


def resolve_redirects_sql(redirects_cte: str, rounds: int = 4) -> str:
    """DuckDB twin: unrolled pointer-doubling CTE chain; final CTE
    ``rr_out`` is (src, final, hops, cyclic) — identical semantics for
    rounds >= log2(longest acyclic chain)."""
    parts = [f"""
rr_m0 AS MATERIALIZED (SELECT src, dst AS cur, CAST(1 AS BIGINT) AS hops
          FROM {redirects_cte})"""]
    for i in range(rounds):
        parts.append(f"""
rr_m{i + 1} AS MATERIALIZED (
  SELECT a.src, coalesce(b.cur, a.cur) AS cur,
         a.hops + coalesce(b.hops, 0) AS hops
  FROM rr_m{i} a LEFT JOIN rr_m{i} b ON b.src = a.cur)""")
    parts.append(f"""
rr_out AS (
  SELECT src,
         CASE WHEN cur IN (SELECT src FROM {redirects_cte})
              THEN NULL ELSE cur END AS final,
         CASE WHEN cur IN (SELECT src FROM {redirects_cte})
              THEN NULL ELSE hops END AS hops,
         cur IN (SELECT src FROM {redirects_cte}) AS cyclic
  FROM rr_m{rounds})""")
    return ",".join(parts)


def clean_anchor_sql(expr: str) -> str:
    """DuckDB scalar twin of ``_clean_anchor`` (same rule order)."""
    from fatespark.htmlx import ENTITIES
    e = f"regexp_replace({expr}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, ch in ENTITIES:
        sq = ch.replace("'", "''")
        e = f"replace({e}, '{ent}', '{sq}')"
    return f"trim(regexp_replace({e}, '[ \\t\\r\\n\\f]+', ' ', 'g'))"


def links_sql(pages_cte: str, html_col: str = "html",
              src_col: str = "doc_id") -> str:
    """DuckDB oracle twin of ``extract_links``: CTE block text whose
    final CTE ``lg_links`` is (src, dst_url, anchor) — the same regex
    text (RE2 runs Java-compatible syntax here: no backrefs), same
    match order (regexp_extract_all preserves document order)."""
    pat = LINK_RE.replace("\\s", "\\s")  # literal; single-quoted SQL
    return f"""
lg_tags AS (
  SELECT {src_col} AS src,
         unnest(regexp_extract_all({html_col}, '{pat}', 0)) AS tag
  FROM {pages_cte}),
lg_links AS (
  SELECT src, regexp_extract(tag, '{pat}', 1) AS dst_url,
         {clean_anchor_sql(f"regexp_extract(tag, '{pat}', 2)")} AS anchor
  FROM lg_tags)"""


def pagerank_sql(edges_cte: str, iterations: int = 5,
                 damping_num: int = 85, damping_den: int = 100,
                 scale: int | None = None) -> str:
    """DuckDB oracle twin: unrolled power-iteration CTE chain over an
    existing edges CTE/relation with columns (src, dst). Returns the
    CTE block text (to splice after the caller's WITH list) whose final
    CTE ``pr_out`` is (node, rank BIGINT). Same integer ops in the same
    order as ``pagerank`` (`//` == Spark ``div`` on non-negatives);
    ``scale=None`` computes the same ``_auto_scale`` bound from the
    node count inside SQL."""
    num, den = damping_num, damping_den
    if scale is None:
        scale_expr = "(SELECT s FROM pr_scale)"
        scale_cte = (f",\npr_scale AS MATERIALIZED (SELECT greatest("
                     f"4611686018427387904 // ({den} * n), 1) AS s "
                     f"FROM pr_n)")
        base = f"(({den - num} * {scale_expr}) // {den})"
    else:
        scale_expr = f"CAST({scale} AS BIGINT)"
        scale_cte = ""
        base = str(((den - num) * scale) // den)
    parts = [f"""
pr_nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM {edges_cte}
    UNION ALL SELECT dst FROM {edges_cte})),
pr_n AS (SELECT count(*) AS n FROM pr_nodes){scale_cte},
pr_deg AS (SELECT src, count(*) AS deg FROM {edges_cte} GROUP BY src),
pr_r0 AS MATERIALIZED (SELECT node, CAST({scale_expr} AS BIGINT) AS rank
          FROM pr_nodes)"""]
    for i in range(iterations):
        r, r2 = f"pr_r{i}", f"pr_r{i + 1}"
        parts.append(f"""
pr_d{i} AS MATERIALIZED (
  SELECT CAST(coalesce(sum(rank), 0) AS BIGINT)
         // (SELECT n FROM pr_n) AS share
  FROM {r} WHERE node NOT IN (SELECT src FROM pr_deg)),
pr_c{i} AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST(sum(r.rank // d.deg) AS BIGINT) AS contrib
  FROM {edges_cte} e
  JOIN {r} r ON r.node = e.src
  JOIN pr_deg d ON d.src = e.src
  GROUP BY e.dst),
{r2} AS MATERIALIZED (
  SELECT nd.node,
         CAST({base} + ({num} * (coalesce(c.contrib, 0)
              + (SELECT share FROM pr_d{i}))) // {den} AS BIGINT) AS rank
  FROM pr_nodes nd LEFT JOIN pr_c{i} c ON c.node = nd.node)""")
    parts.append(f"""
pr_out AS (SELECT node, rank FROM pr_r{iterations})""")
    return ",".join(parts)
