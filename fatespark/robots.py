"""robots.txt parsing and URL allow/deny filtering — RFC 9309 core
semantics as declarative Spark plans (the crawl-side gate in front of
the WARC/htmlx ingest; the reference engine has no crawl layer —
``lib/fates.rb`` ingests given records — so this is pipeline surface,
like ``weburl``'s canonicalizer it composes with).

Semantics implemented (RFC 9309 / original REP core):

- lines are ``Directive: value`` with ``#`` comments stripped;
  directive names case-insensitive; unknown directives ignored;
- a GROUP is a maximal run of User-agent lines followed by its rules
  (gaps-and-islands over the line order);
- group selection: groups whose agent list contains the crawler token
  (case-insensitive exact match) if ANY such group exists for the
  host, else groups containing ``*``; rules of all selected groups
  combine;
- matching is by path PREFIX; the longest matched pattern wins and an
  Allow wins a length tie; an empty-value Disallow is a no-op; a URL
  matching no rule is allowed. (The ``*``/``$`` wildcard extension is
  intentionally out of scope — deterministic prefix rules are the RFC
  core; the module rejects patterns containing them rather than
  mis-matching, so behavior is never silently wrong.)

Scale shape: parsing is per-host window work — a robots.txt is KBs, so
partitions are host-hash balanced and every window is tiny; the URL
filter is one equi-join on host (robots tables are dimension-sized:
broadcast by default) and a per-URL max over its matched rules
(map-side combinable struct max, no window over the URL table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DIRECTIVE_RE = "^[ \t]*([A-Za-z-]+)[ \t]*:[ \t]*(.*?)[ \t]*$"


def parse_robots(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt",
                 agent: str = "fatesbot") -> DataFrame:
    """robots.txt table -> applicable prefix rules per host:
    (``host``, ``allow`` boolean, ``path``). Selection of
    exact-agent-vs-* groups already applied (see module contract)."""
    w = Window.partitionBy(host_col).orderBy("pos")
    lines = (robots.select(
        host_col,
        F.posexplode(F.split(F.col(txt_col), "\r?\n"))
        .alias("pos", "line"))
        .withColumn("line", F.regexp_replace("line", "#.*$", ""))
        .withColumn("dir", F.lower(
            F.regexp_extract("line", _DIRECTIVE_RE, 1)))
        .withColumn("val", F.regexp_extract("line", _DIRECTIVE_RE, 2))
        .where(F.col("dir").isin("user-agent", "allow", "disallow")))
    lines = (lines
             .withColumn("is_ua", F.col("dir") == "user-agent")
             .withColumn("new_grp", (F.col("is_ua") & ~F.coalesce(
                 F.lag("is_ua").over(w), F.lit(False))).cast("int"))
             .withColumn("grp", F.sum("new_grp").over(w)))
    agents = (lines.where("is_ua")
              .groupBy(host_col, "grp")
              .agg(F.collect_set(F.lower("val")).alias("agents"))
              .withColumn("has_exact",
                          F.array_contains("agents", agent.lower()))
              .withColumn("has_star", F.array_contains("agents", "*")))
    host_exact = (agents.groupBy(host_col)
                  .agg(F.max(F.col("has_exact").cast("int"))
                       .alias("exact_any")))
    selected = (agents.join(host_exact, host_col)
                .where((F.col("has_exact")) |
                       ((F.col("exact_any") == 0) & F.col("has_star")))
                .select(host_col, "grp"))
    rules = (lines.where(~F.col("is_ua")).where(F.col("val") != "")
             .join(selected, [host_col, "grp"])
             .select(host_col, (F.col("dir") == "allow").alias("allow"),
                     F.col("val").alias("path")))
    bad = rules.where(F.col("path").rlike("[*$]"))
    # fail loudly on the wildcard extension rather than mis-match
    if bad.limit(1).count() > 0:
        raise ValueError("robots wildcard patterns (*/$) unsupported")
    return rules


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url",
                  broadcast_rules: bool = True) -> DataFrame:
    """urls + (``allowed`` boolean, ``rule`` matched pattern or NULL):
    longest-prefix match, Allow wins ties, no-match allows. ``rules``
    is ``parse_robots`` output; broadcast by default (robots tables
    are hosts-sized — set False to shuffle-join a giant one). The
    per-url max groups by ALL of ``urls``' columns, so fully-duplicate
    url rows collapse to one output row (give rows a distinct id
    upstream if duplicates must survive)."""
    u = (urls.withColumn(
        "_host", F.regexp_extract(url_col, "^[a-z]+://([^/]+)", 1))
        .withColumn("_path", F.coalesce(
            F.nullif(F.regexp_extract(url_col, "^[a-z]+://[^/]+(/.*)$",
                                      1), F.lit("")), F.lit("/"))))
    r = F.broadcast(rules) if broadcast_rules else rules
    j = (u.join(r.withColumnRenamed("host", "_host"), "_host", "left")
         .withColumn("_hit", F.col("path").isNotNull() &
                     F.col("_path").startswith(F.col("path"))))
    best = (j.groupBy(*urls.columns)
            .agg(F.max(F.when(F.col("_hit"), F.struct(
                F.length("path").alias("l"),
                F.col("allow").cast("int").alias("a"),
                F.col("path").alias("p")))).alias("b")))
    return best.select(
        *urls.columns,
        F.coalesce(F.col("b.a") == 1, F.lit(True)).alias("allowed"),
        F.col("b.p").alias("rule"))
