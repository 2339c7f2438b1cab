"""sitemap.xml parsing — the crawl-discovery complement of ``robots``:
urlset/sitemapindex documents -> one row per ``<url>``/``<sitemap>``
entry with loc, lastmod, changefreq, priority. Like ``warc``/``htmlx``,
everything is JVM regexp over text (the sitemap protocol's fields are
flat CDATA-free elements, so anchored non-greedy extracts are exact for
well-formed feeds; no XML lib needed or available distribution-side).

Contract:
- one row per ``<url>...</url>`` block (``<sitemap>`` blocks in an
  index document ride the same extractor via ``tag="sitemap"``);
- ``loc`` is required (rows with empty loc are dropped — the protocol
  makes loc mandatory); lastmod/changefreq/priority are NULL when
  absent; surrounding whitespace trimmed; the five XML core entities
  decoded in loc (&amp; last, the htmlx rule);
- priority is parsed to double (NULL if absent/malformed — ANSI-safe
  try_cast).

Scale shape: identical to ``warc.split_warc`` — few-large-blobs in, one
Generate-streamed explode to entries, narrow extracts on the emitted
row. A 50k-url sitemap (the protocol max) is a ~10 MB row; the explode
never materializes it per-entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&apos;", "'"), ("&amp;", "&")]


def _field(block, name: str):
    c = F.regexp_extract(
        block, f"(?is)<{name}[^>]*>(.*?)</{name}>", 1)
    return F.nullif(F.trim(c), F.lit(""))


def parse_sitemap(blobs: DataFrame, xml_col: str = "xml",
                  tag: str = "url") -> DataFrame:
    """blob table -> (other cols..., loc, lastmod, changefreq,
    priority double): one row per ``<tag>`` block. ``tag="sitemap"``
    parses index documents (loc/lastmod only, the others NULL)."""
    x = F.col(xml_col)
    if dict(blobs.dtypes).get(xml_col) == "binary":
        x = F.decode(x, "UTF-8")
    blocks = F.regexp_extract_all(
        x, F.lit(f"(?is)<{tag}>(.*?)</{tag}>"), 1)
    out = (blobs.withColumn("_b", F.explode(blocks)).drop(xml_col))
    loc = _field(F.col("_b"), "loc")
    for ent, ch in _ENTITIES:
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    return (out.select(
        "*",
        loc.alias("loc"),
        _field(F.col("_b"), "lastmod").alias("lastmod"),
        _field(F.col("_b"), "changefreq").alias("changefreq"),
        _field(F.col("_b"), "priority").try_cast("double")
        .alias("priority"))
        .where(F.col("loc").isNotNull())
        .drop("_b"))


def parse_sitemap_sql(blobs_cte: str, xml_col: str = "xml",
                      tag: str = "url") -> str:
    """DuckDB twin: CTE block whose final CTE ``sm_out`` is
    (loc, lastmod, changefreq, priority) — same regex text, same
    entity order, same try-cast semantics."""
    def fld(name: str) -> str:
        return (f"nullif(trim(regexp_extract(b, "
                f"'(?is)<{name}[^>]*>(.*?)</{name}>', 1)), '')")
    loc = fld("loc")
    for ent, ch in _ENTITIES:
        sq = ch.replace("'", "''")
        loc = f"replace({loc}, '{ent}', '{sq}')"
    return f"""
sm_blocks AS (
  SELECT unnest(regexp_extract_all({xml_col},
                '(?is)<{tag}>(.*?)</{tag}>', 1)) AS b
  FROM {blobs_cte}),
sm_out AS (
  SELECT {loc} AS loc,
         {fld("lastmod")} AS lastmod,
         {fld("changefreq")} AS changefreq,
         TRY_CAST({fld("priority")} AS DOUBLE) AS priority
  FROM sm_blocks
  WHERE {loc} IS NOT NULL)"""
