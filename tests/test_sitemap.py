"""sitemap.xml parsing: field extraction, entity decode, optional
fields, index documents, SQL-twin parity."""

import pandas as pd

from fatespark.sitemap import parse_sitemap, parse_sitemap_sql

SM = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://h.test/a?x=1&amp;y=2</loc>
    <lastmod>2026-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> http://h.test/b </loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc>http://h.test/c</loc><priority>high</priority></url>
</urlset>"""

IDX = """<sitemapindex>
  <sitemap><loc>http://h.test/sm1.xml</loc>
           <lastmod>2026-02-01</lastmod></sitemap>
  <sitemap><loc>http://h.test/sm2.xml</loc></sitemap>
</sitemapindex>"""


class TestSitemap:
    def test_fields_entities_and_optionals(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"xml": [SM]}))
        rows = parse_sitemap(df).orderBy("loc").collect()
        # the loc-less <url> block is dropped (loc is mandatory)
        assert len(rows) == 3
        a, b, c = rows
        assert a["loc"] == "http://h.test/a?x=1&y=2"  # entity decoded
        assert (a["lastmod"], a["changefreq"], a["priority"]) == \
            ("2026-01-05", "daily", 0.8)
        assert b["loc"] == "http://h.test/b"  # trimmed
        assert b["lastmod"] is None and b["priority"] is None
        assert c["priority"] is None  # malformed -> NULL, not error

    def test_index_document(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"xml": [IDX]}))
        rows = parse_sitemap(df, tag="sitemap").orderBy("loc").collect()
        assert [r["loc"] for r in rows] == [
            "http://h.test/sm1.xml", "http://h.test/sm2.xml"]
        assert rows[0]["lastmod"] == "2026-02-01"

    def test_binary_decoded(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"xml": [SM.encode()]}))
        assert parse_sitemap(df).count() == 3

    def test_sql_twin(self, spark):
        import duckdb
        df = spark.createDataFrame(pd.DataFrame({"xml": [SM]}))
        want = [(r["loc"], r["lastmod"], r["changefreq"], r["priority"])
                for r in parse_sitemap(df).orderBy("loc").collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE blobs(xml VARCHAR)")
        con.execute("INSERT INTO blobs VALUES (?)", [SM])
        sql = ("WITH " + parse_sitemap_sql("blobs") +
               " SELECT * FROM sm_out ORDER BY loc")
        assert con.execute(sql).fetchall() == want
