"""General HTML -> text extraction as a pure JVM expression chain — the
real-markup generalization of ``analysis.extract_text`` (the corpus-
wrapper fast path with the byte-identical per-url invariant,
``lib/fates.rb:23-31`` analogue: the reference indexes pre-extracted
record text; a web corpus must produce that text from markup first).

Contract (deterministic, SQL-replicable — every step is one
``regexp_replace``/``replace`` both engines run identically):

1. decode the ``html`` binary as UTF-8;
2. drop <script>/<style>/<noscript> elements wholesale (case-insensitive,
   dot-matches-newline, non-greedy to the matching close tag);
3. drop <!-- comments -->;
4. strip every remaining tag to a space (so adjacent text never fuses);
5. decode the six core named entities — &lt; &gt; &quot; &#39; &nbsp;
   first and &amp; LAST, so double-encoded ``&amp;lt;`` yields ``&lt;``
   not ``<`` (the standard single-pass decode order);
6. collapse [ \\t\\r\\n\\f]+ runs to one space and trim.

ALL text content survives, including <title> (documented; boilerplate
removal is a separate concern — see the Gopher/C4/CCNet quality tier).
On the corpus wrapper ``<html><body>{text}</body></html>`` the chain
returns ``text`` byte-identically (tested against
``analysis.extract_text``), because the payload is already
whitespace-normalized.

Scale shape: a narrow per-row JVM projection — zero shuffles, runs
inside the scan stage with whole-stage codegen, no Python anywhere.
Patterns avoid backreferences/lookaround so the DuckDB (RE2) twin is
literally the same regex text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (entity, replacement) in decode order — &amp; must be last
ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]
DROP_ELEMENTS = ("script", "style", "noscript")


def extracted_text_col(html_col: Column | str,
                       normalize_ws: bool = True) -> Column:
    """Column expression: html binary/string -> page text.

    ``normalize_ws=False`` skips step 6 (only the ends are trimmed): on
    the corpus wrapper this returns the payload BYTE-identically for any
    payload content, including raw tabs/newlines — the per-url invariant
    ``analysis.extract_text`` pins. The default collapses runs, which is
    what an indexing pipeline wants (and is byte-identical on payloads
    that are already single-spaced)."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    h = F.decode(c, "UTF-8")
    for tag in DROP_ELEMENTS:
        h = F.regexp_replace(h, f"(?is)<{tag}[^>]*>.*?</{tag}>", " ")
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    h = F.regexp_replace(h, r"(?s)<[^>]*>", " ")
    for ent, ch in ENTITIES:
        h = F.replace(h, F.lit(ent), F.lit(ch))
    if normalize_ws:
        h = F.regexp_replace(h, "[ \t\r\n\f]+", " ")
        return F.trim(h)
    return F.trim(h)


def extract_pages(pages: DataFrame, html_col: str = "html",
                  out_col: str = "text",
                  normalize_ws: bool = True) -> DataFrame:
    """pages + ``out_col`` = extracted text (replaces an existing column
    of that name): the ingest step that turns a crawl table
    (url, warc_ts, html, ...) into the engine's indexable text."""
    return pages.withColumn(
        out_col, extracted_text_col(html_col, normalize_ws=normalize_ws))


def extraction_sql_expr(col: str = "html") -> str:
    """The identical chain as a DuckDB SQL scalar expression over a
    BLOB/VARCHAR column — the oracle twin (RE2 runs the same patterns)."""
    e = f"CAST({col} AS VARCHAR)"
    for tag in DROP_ELEMENTS:
        e = (f"regexp_replace({e}, '(?is)<{tag}[^>]*>.*?</{tag}>', ' ', "
             f"'g')")
    e = f"regexp_replace({e}, '(?s)<!--.*?-->', ' ', 'g')"
    e = f"regexp_replace({e}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, ch in ENTITIES:
        sq = ch.replace("'", "''")
        e = f"replace({e}, '{ent}', '{sq}')"
    e = (f"regexp_replace({e}, '[ \\t\\r\\n\\f]+', ' ', 'g')")
    return f"trim({e})"
