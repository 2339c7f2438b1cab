"""WARC synthesis/split/parse: round-trip identity, multi-record
blobs, torn-blob recovery, Content-Length octets, SQL-twin parity."""

import pandas as pd

from fatespark.warc import (CRLF, parse_warc, read_warc, split_warc,
                            split_parse_sql, warc_record_col,
                            warc_record_sql)


def _blob(spark, urls, bodies, ts="2026-01-01T00:00:00Z"):
    rec = warc_record_col
    import pyspark.sql.functions as F
    rows = spark.createDataFrame(pd.DataFrame(
        {"url": urls, "body": bodies})).select(
        rec(F.col("url"), F.lit(ts), F.col("body")).alias("r"))
    recs = [r["r"] for r in rows.collect()]
    return (CRLF + CRLF).join(recs)


class TestWarc:
    def test_round_trip_multi_record(self, spark):
        blob = _blob(spark, ["http://a.test/1", "http://b.test/2"],
                     ["<html>one</html>", "<html>two & x</html>"])
        df = spark.createDataFrame(pd.DataFrame({"blob": [blob]}))
        got = read_warc(df).orderBy("url").collect()
        assert [(r["url"], r["http_status"], r["body"]) for r in got] == [
            ("http://a.test/1", 200, "<html>one</html>"),
            ("http://b.test/2", 200, "<html>two & x</html>")]
        assert all(r["warc_date"] == "2026-01-01T00:00:00Z" for r in got)

    def test_body_may_contain_blank_lines(self, spark):
        body = "line1\r\n\r\nline2"  # blank line INSIDE the body
        blob = _blob(spark, ["http://a.test"], [body])
        df = spark.createDataFrame(pd.DataFrame({"blob": [blob]}))
        assert read_warc(df).collect()[0]["body"] == body

    def test_content_length_is_octets(self, spark):
        blob = _blob(spark, ["http://a.test"], ["café"])  # 5 octets
        import re
        m = re.search(r"Content-Length: (\d+)", blob)
        http_block = blob.split("\r\n\r\n", 1)[1]
        assert int(m.group(1)) == len(http_block.encode())

    def test_torn_blob_keeps_intact_records(self, spark):
        blob = _blob(spark, ["http://a.test"], ["<p>ok</p>"])
        torn = "URI: gone\r\n\r\ntail" + CRLF + CRLF + blob
        df = spark.createDataFrame(pd.DataFrame({"blob": [torn]}))
        rows = read_warc(df).where("url <> ''").collect()
        assert len(rows) == 1 and rows[0]["body"] == "<p>ok</p>"

    def test_binary_blob_decoded(self, spark):
        blob = _blob(spark, ["http://a.test"], ["<p>b</p>"])
        df = spark.createDataFrame(
            pd.DataFrame({"blob": [blob.encode()]}))
        assert split_warc(df).count() == 1

    def test_sql_twin_parity(self, spark):
        import duckdb
        blob = _blob(spark, ["http://a.test/1", "http://b.test/2"],
                     ["<html>one</html>", "x & <b>y</b>"])
        df = spark.createDataFrame(pd.DataFrame({"blob": [blob]}))
        got = [(r["url"], r["warc_date"], r["http_status"], r["body"])
               for r in read_warc(df).orderBy("url").collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE blobs(blob VARCHAR)")
        con.execute("INSERT INTO blobs VALUES (?)", [blob])
        sql = ("WITH " + split_parse_sql("blobs") +
               " SELECT url, warc_date, http_status, body FROM warc_rows"
               " ORDER BY url")
        assert con.execute(sql).fetchall() == got

    def test_record_builder_sql_twin(self, spark):
        import duckdb
        blob = _blob(spark, ["http://a.test"], ["<p>z</p>"])
        con = duckdb.connect()
        expr = warc_record_sql("'http://a.test'",
                               "'2026-01-01T00:00:00Z'", "'<p>z</p>'")
        assert con.execute(f"SELECT {expr}").fetchone()[0] == blob
