"""URL canonicalization and per-domain operators for web corpora.

Every training-data pipeline over crawled pages needs a URL layer before
dedup and sampling: two crawls of the same page differ by tracking params,
fragments, case, default ports, and trailing slashes, so exact URL dedup
and per-domain statistics are meaningless on raw URLs. These operators are
pure JVM expressions (regexp/split/filter/sort — whole-stage codegen, no
Python), and every step is expressible in ANSI SQL so the DuckDB driver
oracles replicate the whole chain.

Normalization contract (documented so the oracle is definitional):

1. trim; drop the fragment (``#...``).
2. If the string does not match ``scheme://...`` it passes through
   unchanged (and its domain is '').
3. Scheme and host:port lowercase; the default port for the scheme
   (``:80`` http, ``:443`` https) is stripped.
4. Path: all trailing slashes stripped; empty path becomes ``/``.
5. Query: parameters split on ``&``; tracking params dropped
   (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``yclid``, ``ref``,
   ``ref_src``); survivors SORTED (byte order) and rejoined — parameter
   order never distinguishes two URLs again.

Reference analogue: none (target-new training-data op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["normalize_url_col", "host_col", "registered_domain_col",
           "url_normalize_df", "per_domain_cap"]

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://.*$"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"
# tracking params dropped by the normalizer (match the whole key)
TRACKING_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|yclid|ref|ref_src)(=.*)?$"
# public-suffix-lite: a 2-char TLD preceded by one of these second-level
# labels keeps three labels (example.co.uk), everything else keeps two
_SLD = ("co", "com", "org", "net", "gov", "edu", "ac")


def _defragged(url_col):
    return F.regexp_replace(F.trim(url_col), "#.*$", "")


def host_col(url_col):
    """Lowercased host (port stripped) of a URL column; '' for non-URLs."""
    s = _defragged(url_col)
    hostport = F.lower(F.regexp_extract(s, _HOSTPORT_RE, 1))
    return F.regexp_replace(hostport, ":[0-9]*$", "")


def normalize_url_col(url_col):
    """Canonical form of a URL column per the module contract. Non-URL
    strings (no ``scheme://``) pass through trimmed-and-defragged."""
    s = _defragged(url_col)
    scheme = F.lower(F.regexp_extract(s, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(s, _HOSTPORT_RE, 1))
    default_port = F.when(scheme == "http", F.lit(":80")) \
                    .when(scheme == "https", F.lit(":443")) \
                    .otherwise(F.lit(""))
    host = F.when(
        (default_port != "") & hostport.endswith(default_port),
        hostport.substr(F.lit(1), F.length(hostport)
                        - F.length(default_port))
    ).otherwise(hostport)
    rest = F.regexp_extract(s, _REST_RE, 1)
    qpos = F.instr(rest, "?")
    rawpath = F.when(qpos > 0, rest.substr(F.lit(1), qpos - 1)) \
               .otherwise(rest)
    qs = F.when(qpos > 0,
                rest.substr(qpos + 1, F.length(rest))).otherwise(F.lit(""))
    path = F.regexp_replace(rawpath, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(F.filter(
        F.split(qs, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_RE)))
    qnorm = F.array_join(params, "&")
    norm = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")))
    return F.when(scheme == "", s).otherwise(norm)


def registered_domain_col(url_col):
    """Registered domain of a URL column: last two host labels, or last
    three when the second-level label is a known public-suffix-lite entry
    under a 2-char TLD (``example.co.uk``). '' for non-URLs; hosts with
    fewer than two labels (e.g. ``localhost``) pass through whole."""
    h = host_col(url_col)
    labels = F.split(h, "\\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    sld = F.when(n >= 2, F.element_at(labels, -2)).otherwise(F.lit(""))
    three = (n >= 3) & (F.length(tld) == 2) & sld.isin(*_SLD)
    return F.when(h == "", F.lit("")) \
            .when(three, F.concat_ws(".", F.element_at(labels, -3),
                                     sld, tld)) \
            .when(n >= 2, F.concat_ws(".", sld, tld)) \
            .otherwise(h)


def url_normalize_df(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, url_norm, host, domain) — one row per input row, NARROW (pure
    per-row expressions; at 10^12 rows this runs inside the scan stage)."""
    u = F.col(url_col)
    return df.select(
        F.col(id_col).alias("id"),
        normalize_url_col(u).alias("url_norm"),
        host_col(u).alias("host"),
        registered_domain_col(u).alias("domain"))


def per_domain_cap(df: DataFrame, cap: int, domain_col: str = "domain",
                   order_col: str = "doc_id", ascending: bool = True,
                   tiebreak_col: str | None = "doc_id") -> DataFrame:
    """Keep at most ``cap`` rows per domain, ranked by ``order_col`` with
    ties broken by ``tiebreak_col`` (pass a UNIQUE column — with ties left
    unbroken, row_number's survivor set would depend on partition order) —
    the standard per-site cap a webtext pipeline applies before training
    (a single boilerplate-heavy site must not dominate the corpus).

    One window shuffle on the domain. At 10^12 rows with a hot domain
    (10^8 pages of one site), pre-prune before the window:
    ``df.sortWithinPartitions(...)`` + per-partition head-``cap`` keeps at
    most ``cap × n_partitions`` rows per domain entering the shuffle —
    composable on top of this operator; the cap semantics are unchanged.
    """
    from pyspark.sql import Window
    oc = F.col(order_col) if ascending else F.col(order_col).desc()
    order = [oc] if tiebreak_col is None or tiebreak_col == order_col \
        else [oc, F.col(tiebreak_col)]
    w = Window.partitionBy(domain_col).orderBy(*order)
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= cap)
            .drop("_rk"))


def url_filter(df: DataFrame, blocked_domains: list[str],
               blocked_substrings: list[str] | None = None,
               url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """URL blocklist filter (the UT1/Blacklists-UT-Capitole step FineWeb
    and friends apply before any content filtering): flag a page when its
    REGISTERED DOMAIN is on a blocklist, or when its normalized URL
    contains any banned substring (the path/query keyword rule). Output
    (id, domain, blocked_domain, blocked_pattern, keep) per row.

    100 TB shape: the domain check is a broadcast LEFT join against the
    blocklist — real blocklists run to millions of domains (UT1 'adult'
    alone is ~4M), far past `isin` literal-plan territory but trivially
    broadcastable (~100 MB), and the corpus side never shuffles. The
    substring rule is a narrow JVM `contains` chain (banned-keyword lists
    are small); both flags evaluate inside the scan stage. Normalization
    reuses ``normalize_url_col``, so ``?Item1`` vs ``#Item1`` vs tracking
    params can't dodge the filter.

    Reference analogue: none (fates has no web surface); target-new per
    the survey's LLM-data ops mandate."""
    u = F.col(url_col)
    base = df.select(
        F.col(id_col).alias("id"),
        normalize_url_col(u).alias("url_norm"),
        registered_domain_col(u).alias("domain"))
    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(d.lower(),) for d in sorted(set(blocked_domains))],
        "domain string").withColumn("__bd", F.lit(True))
    out = base.join(F.broadcast(bl), "domain", "left")
    # keyword match is case-insensitive on the whole normalized URL —
    # normalization lowercases scheme+host only (path case is significant
    # per RFC 3986), but a blocklist keyword must not be dodgeable by case
    bp = F.lit(False)
    for s in (blocked_substrings or []):
        bp = bp | F.contains(F.lower(F.col("url_norm")), F.lit(s.lower()))
    return out.select(
        "id", "domain",
        F.coalesce(F.col("__bd"), F.lit(False)).alias("blocked_domain"),
        bp.alias("blocked_pattern"),
        (F.col("__bd").isNull() & ~bp).alias("keep"))


def recrawl_latest(pages: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts",
                   text_col: str = "text") -> DataFrame:
    """Recrawl version resolution over a ``(url, warc_ts)``-keyed corpus:
    keep each url's LATEST crawl and report how it got there —
    ``n_versions`` (how many crawls of this url the corpus holds) and
    ``changed`` (1 iff the latest crawl's text differs from the previous
    version's; 0 for first-seen urls and byte-identical recrawls).

    This is the step between raw Common-Crawl ingest and every
    downstream operator: indexes, dedup and quality filters all want ONE
    row per url, and the change flag is the freshness signal a
    re-crawl scheduler feeds on. Change detection compares the text
    column itself (exact, definitional — hash upstream if the text is
    huge). Crawl timestamps must be unique per url (the WARC contract);
    ties would make "latest" ambiguous.

    Scale shape: ONE window shuffle on url (all three window functions
    share the same partitioning); no joins, nothing corpus-sized
    collected.
    """
    from pyspark.sql.window import Window
    w_url = Window.partitionBy(url_col)
    w_desc = w_url.orderBy(F.desc(ts_col))
    w_asc = w_url.orderBy(F.asc(ts_col))
    prev = F.lag(F.col(text_col)).over(w_asc)
    keep = [c for c in pages.columns]
    return (pages
            .withColumn("_rn", F.row_number().over(w_desc))
            .withColumn("n_versions", F.count(F.lit(1)).over(w_url))
            .withColumn("changed",
                        (prev.isNotNull()
                         & (F.col(text_col) != prev)).cast("int"))
            .filter(F.col("_rn") == 1)
            .select(*keep, "n_versions", "changed"))
