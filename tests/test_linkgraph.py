"""Link extraction semantics + integer-exact PageRank: local-twin
parity, hand-computed fixed points, invariants, and plan shape."""

import pandas as pd
import pytest

from fatespark.linkgraph import (extract_links, pagerank, pagerank_local,
                                 pagerank_sql)


def _links(spark, html: str):
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["u0"], "html": [html]}))
    return [(r["dst_url"], r["anchor"])
            for r in extract_links(df).collect()]


class TestExtractLinks:
    def test_basic_and_order(self, spark):
        h = ('<p><a href="http://a.test/1">first</a> text '
             '<a class="x" href="http://b.test/2">second link</a></p>')
        assert _links(spark, h) == [("http://a.test/1", "first"),
                                    ("http://b.test/2", "second link")]

    def test_anchor_markup_stripped_entities(self, spark):
        h = '<a href="/r">a <b>bold</b>&nbsp;&amp;amp; x</a>'
        assert _links(spark, h) == [("/r", "a bold &amp; x")]

    def test_multiline_and_case(self, spark):
        h = '<A HREF="http://c.test">line\none</A>'
        assert _links(spark, h) == [("http://c.test", "line one")]

    def test_no_links(self, spark):
        assert _links(spark, "<p>plain</p>") == []

    def test_binary_html_decoded(self, spark):
        df = spark.createDataFrame(pd.DataFrame(
            {"url": ["u"], "html": [b'<a href="x">t</a>']}))
        assert extract_links(df).collect()[0]["dst_url"] == "x"


def _run(spark, edge_list, **kw):
    df = spark.createDataFrame(
        pd.DataFrame(edge_list, columns=["src", "dst"]))
    got = {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}
    want = pagerank_local(edge_list, **kw)
    return got, want


class TestPagerank:
    def test_cycle_uniform(self, spark):
        # 3-cycle: perfectly symmetric, every node keeps mass == scale
        # up to floor loss; all equal.
        got, want = _run(spark, [(0, 1), (1, 2), (2, 0)])
        assert got == want
        assert len(set(got.values())) == 1

    def test_star_with_dangling(self, spark):
        # 1,2,3 -> 0; 0 has no out-edges (dangling hub)
        edges = [(1, 0), (2, 0), (3, 0)]
        got, want = _run(spark, edges)
        assert got == want
        assert got[0] > got[1] == got[2] == got[3]

    def test_multigraph_double_edge_counts_twice(self, spark):
        g1, _ = _run(spark, [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)])
        g2, _ = _run(spark, [(0, 1), (0, 2), (1, 0), (2, 0)])
        assert g1[1] > g2[1]

    def test_mass_conservation_upper_bound(self, spark):
        edges = [(i, (i * 7 + 3) % 20) for i in range(20) if i % 5]
        got, want = _run(spark, edges, iterations=8, scale=10 ** 12)
        assert got == want
        n = len(got)
        assert sum(got.values()) <= n * 10 ** 12
        # floor losses are bounded: within 1% of total mass here
        assert sum(got.values()) >= int(0.99 * n * 10 ** 12)

    def test_auto_scale_matches_local_and_hub_safe(self, spark):
        # head-hub graph (everyone -> 0): the shape that overflowed a
        # fixed 10**12 scale at 2M nodes; auto scale keeps num*N*scale
        # < 2**63 by construction and the twin derives the same value
        from fatespark.linkgraph import _auto_scale
        edges = [(i, 0) for i in range(1, 40)] + [(0, 1)]
        got, want = _run(spark, edges)  # scale=None both sides
        assert got == want
        assert max(got.values()) < 2 ** 62 // 85
        assert want[0] > want[2]
        s = _auto_scale(40, 100)
        assert 100 * 40 * s < 2 ** 63

    def test_deterministic_across_runs(self, spark):
        edges = [(i, (i * 13 + 7) % 50) for i in range(50)]
        a, _ = _run(spark, edges)
        b, _ = _run(spark, edges)
        assert a == b

    def test_empty(self, spark):
        df = spark.createDataFrame([], "src long, dst long")
        assert pagerank(df).count() == 0

    def test_sql_twin_matches(self, spark):
        import duckdb
        edges = [(i, (i * 7 + 13) % 30) for i in range(30) if i % 10] + \
                [(i, 0) for i in range(30) if i % 10]
        _, want = _run(spark, edges, iterations=4)
        con = duckdb.connect()
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        sql = "WITH " + pagerank_sql("e", iterations=4) + \
              " SELECT node, rank FROM pr_out"
        got = dict(con.execute(sql).fetchall())
        assert got == want

    def test_no_cartesian_in_plan(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame([(0, 1), (1, 0)], columns=["src", "dst"]))
        plan = pagerank(df, iterations=1)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Cartesian" not in plan


class TestRedirects:
    def _run(self, spark, pairs, rounds=16):
        from fatespark.linkgraph import resolve_redirects
        df = spark.createDataFrame(
            pd.DataFrame(pairs, columns=["src", "dst"]))
        return {r["src"]: (r["final"], r["hops"], r["cyclic"])
                for r in resolve_redirects(df, rounds=rounds).collect()}

    def test_chain_and_hops(self, spark):
        got = self._run(spark, [(1, 2), (2, 3), (3, 4), (10, 4)])
        assert got[1] == (4, 3, False)
        assert got[2] == (4, 2, False)
        assert got[10] == (4, 1, False)

    def test_cycle_flagged_not_misresolved(self, spark):
        got = self._run(spark, [(1, 2), (2, 1), (5, 1)])
        # 5 walks into the cycle: also unresolvable
        assert got[1] == (None, None, True)
        assert got[2] == (None, None, True)
        assert got[5] == (None, None, True)

    def test_long_chain_log_rounds(self, spark):
        pairs = [(i, i + 1) for i in range(200)]
        got = self._run(spark, pairs, rounds=8)  # 2^8 >= 200
        assert got[0] == (200, 200, False)

    def test_sql_twin(self, spark):
        import duckdb
        pairs = [(i, i + 1) for i in range(1, 6)] + \
                [(8, 9), (9, 8), (20, 3)]
        want = self._run(spark, pairs, rounds=4)
        from fatespark.linkgraph import resolve_redirects_sql
        con = duckdb.connect()
        con.execute("CREATE TABLE r(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO r VALUES (?, ?)", pairs)
        sql = ("WITH " + resolve_redirects_sql("r", rounds=4) +
               " SELECT * FROM rr_out")
        got = {s: (f, h, c)
               for s, f, h, c in con.execute(sql).fetchall()}
        assert got == want


class TestHits:
    def _run(self, spark, pairs, **kw):
        from fatespark.linkgraph import hits, hits_local
        df = spark.createDataFrame(
            pd.DataFrame(pairs, columns=["src", "dst"]))
        got = {r["node"]: (r["hub"], r["authority"])
               for r in hits(df, **kw).collect()}
        want = hits_local(pairs, **kw)
        return got, want

    def test_star_hub_authority_separation(self, spark):
        # 1,2,3 all point at 0; 0 points nowhere: 0 is the authority,
        # 1..3 are (equal) hubs, 0 has no hub score, 1..3 no authority
        got, want = self._run(spark, [(1, 0), (2, 0), (3, 0)])
        assert got == want
        assert got[0][1] > 0 and got[0][0] == 0
        assert got[1] == got[2] == got[3]
        assert got[1][0] > 0 and got[1][1] == 0

    def test_bipartite_degree_order(self, spark):
        # authority ordering follows weighted in-degree from hub mass
        pairs = [(10, 1), (10, 2), (11, 1), (12, 1), (12, 3)]
        got, want = self._run(spark, pairs)
        assert got == want
        assert got[1][1] > got[2][1] >= got[3][1]

    def test_deterministic_and_sql_twin(self, spark):
        import duckdb
        from fatespark.linkgraph import hits_sql
        pairs = [(i, (i * 7 + 13) % 30) for i in range(30) if i % 10] + \
                [(i, 0) for i in range(30) if i % 10]
        got, want = self._run(spark, pairs, iterations=4)
        assert got == want
        con = duckdb.connect()
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", pairs)
        sql = ("WITH " + hits_sql("e", iterations=4) +
               " SELECT node, hub, authority FROM hits_out")
        got_sql = {n: (h, a)
                   for n, h, a in con.execute(sql).fetchall()}
        assert got_sql == want

    def test_cap_bound_holds(self, spark):
        # heavy hub: 200 -> one target; scores stay under 2^(cap+1)
        pairs = [(i, 0) for i in range(1, 201)]
        got, want = self._run(spark, pairs, cap_bits=20)
        assert got == want
        assert max(v for hv, av in got.values()
                   for v in (hv, av)) < 2 ** 21

    def test_empty(self, spark):
        from fatespark.linkgraph import hits
        df = spark.createDataFrame([], "src long, dst long")
        assert hits(df).count() == 0
