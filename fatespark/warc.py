"""WARC record synthesis, splitting, and parsing — the Common-Crawl
ingest step in front of ``htmlx``: raw archive blobs (many records per
blob, the real CC file shape) -> one row per response record with
(url, warc_date, http_status, body). The reference ingests flat
records (``lib/fates.rb:23-31``); a crawl pipeline must produce them
from archive bytes first.

Record layout (WARC/1.0 response records, CRLF line ends)::

    WARC/1.0
    WARC-Type: response
    WARC-Target-URI: <url>
    WARC-Date: <iso8601>
    Content-Type: application/http; msgtype=response
    Content-Length: <octets of the HTTP block>
    <blank>
    HTTP/1.1 200 OK
    Content-Type: text/html
    <blank>
    <body>

Records in a blob are separated by one blank line (CRLF CRLF), the
standard WARC record separator.

Parsing contract (every step one JVM ``split``/``regexp_extract`` —
zero Python, zero shuffles; the record explode emits the raw record
text and field extraction happens on the emitted row):

- records are recovered by splitting on the ``WARC/1.0\\r\\n`` version
  line (empty leading piece dropped), so a torn blob yields its intact
  records rather than failing wholesale;
- url / date / status are single-line header extracts;
- body is everything after the SECOND blank line (end of WARC headers,
  end of HTTP headers), with trailing CR/LF record-separator residue
  stripped — bodies therefore must not themselves end in bare CR/LF
  (true of markup; binary payloads would use the Content-Length cut,
  which needs per-record octet arithmetic, not a regex — out of scope
  for the text tier and documented here).

Scale shape: blobs arrive few-and-large (a CC segment is ~1 GB); the
explode is the one fan-out and Spark's Generate streams it — no blob
is ever materialized per-record. Everything else is narrow. At 100 TB
the only knob is input split size (``maxPartitionBytes``) on the blob
scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CRLF = "\r\n"
VERSION_LINE = "WARC/1.0" + CRLF
HTTP_HEAD = "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF
_URL_RE = "WARC-Target-URI: ([^\r\n]+)"
_DATE_RE = "WARC-Date: ([^\r\n]+)"
_STATUS_RE = "HTTP/1\\.1 (\\d+)"
_BODY_RE = "(?s)\r\n\r\n.*?\r\n\r\n(.*)$"


def warc_record_col(url: Column, ts: Column, body: Column) -> Column:
    """Build one WARC/1.0 response record (no trailing separator) —
    the deterministic fixture generator. Content-Length is the octet
    length of the HTTP block, as the spec requires."""
    http_block = F.concat(F.lit(HTTP_HEAD), F.lit(CRLF), body)
    return F.concat(
        F.lit(VERSION_LINE),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(CRLF),
        F.lit("WARC-Date: "), ts, F.lit(CRLF),
        F.lit("Content-Type: application/http; msgtype=response" + CRLF),
        F.lit("Content-Length: "),
        F.octet_length(http_block).cast("string"), F.lit(CRLF),
        F.lit(CRLF), http_block)


def split_warc(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Explode archive blobs into one row per record: the blob's other
    columns + ``record`` (the record text, version line stripped).
    Binary blobs are decoded as UTF-8."""
    b = F.col(blob_col)
    if dict(blobs.dtypes).get(blob_col) == "binary":
        b = F.decode(b, "UTF-8")
    pieces = F.split(b, "WARC/1\\.0\r\n")
    return (blobs.withColumn("record", F.explode(pieces))
            .drop(blob_col)
            .where(F.col("record") != ""))


def parse_warc(records: DataFrame,
               record_col: str = "record") -> DataFrame:
    """records + (url, warc_date, http_status int, body): single-line
    header extracts + the after-second-blank-line body rule."""
    r = F.col(record_col)
    body = F.regexp_replace(
        F.regexp_extract(r, _BODY_RE, 1), "[\r\n]+$", "")
    return records.select(
        "*",
        F.regexp_extract(r, _URL_RE, 1).alias("url"),
        F.regexp_extract(r, _DATE_RE, 1).alias("warc_date"),
        F.regexp_extract(r, _STATUS_RE, 1).cast("int")
        .alias("http_status"),
        body.alias("body"))


def read_warc(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """blob table -> (url, warc_date, http_status, body) page rows:
    the full ingest step (compose with ``htmlx.extract_pages`` for
    text, then the index build)."""
    return parse_warc(split_warc(blobs, blob_col)).drop("record")


# -- DuckDB oracle twins -----------------------------------------------------

def warc_record_sql(url: str, ts: str, body: str) -> str:
    """SQL scalar building the identical record text (octet_length for
    Content-Length, chr(13)||chr(10) line ends)."""
    nl = "chr(13) || chr(10)"
    http = (f"'HTTP/1.1 200 OK' || {nl} || 'Content-Type: text/html' "
            f"|| {nl} || {nl} || ({body})")
    return (f"'WARC/1.0' || {nl} || 'WARC-Type: response' || {nl} || "
            f"'WARC-Target-URI: ' || ({url}) || {nl} || "
            f"'WARC-Date: ' || ({ts}) || {nl} || "
            f"'Content-Type: application/http; msgtype=response' || {nl} "
            f"|| 'Content-Length: ' || CAST(octet_length(encode({http})) "
            f"AS VARCHAR) || {nl} || {nl} || {http}")


def split_parse_sql(blobs_cte: str, blob_col: str = "blob") -> str:
    """CTE block whose final CTE ``warc_rows`` is (url, warc_date,
    http_status, body) — the same split + regex rules under RE2 (the
    pattern text carries the \\r\\n escapes, which the regex engine,
    not the SQL string literal, interprets)."""
    nl = "chr(13) || chr(10)"
    return f"""
warc_recs AS (
  SELECT unnest(string_split({blob_col},
                'WARC/1.0' || {nl})) AS record
  FROM {blobs_cte}),
warc_rows AS (
  SELECT regexp_extract(record, 'WARC-Target-URI: ([^\\r\\n]+)', 1)
           AS url,
         regexp_extract(record, 'WARC-Date: ([^\\r\\n]+)', 1)
           AS warc_date,
         CAST(regexp_extract(record, 'HTTP/1\\.1 (\\d+)', 1) AS INT)
           AS http_status,
         regexp_replace(regexp_extract(record,
             '(?s)\\r\\n\\r\\n.*?\\r\\n\\r\\n(.*)$', 1),
             '[\\r\\n]+$', '') AS body
  FROM warc_recs WHERE record <> '')"""
