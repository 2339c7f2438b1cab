"""jusText-style boilerplate classification: rule-by-rule + SQL twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from fatespark import boiler

PAGES = [
    # nav (bad by links), good body, link list (bad), short, footer (bad)
    (1, '<html><head><title>pagetitle</title><style>p{x}</style></head>'
        '<body><div><a href="/">Home page</a> <a href="/a">About the '
        'team</a></div>'
        '<p>the quick brown fox is one of the best animals in the world '
        'and it is fast</p>'
        '<ul><li><a href="/m">More stories</a></li></ul>'
        '<p>Short.</p>'
        '<div>copyright 2024 example corporation content reserved</div>'
        '</body></html>'),
    # no stopwords at all -> body is bad; <script> content must vanish
    (2, '<html><body><script>var the = "of and to a in is";</script>'
        '<p>word salad batch join scan merge vector column packing</p>'
        '</body></html>'),
    # neargood band: 2 stopwords / 12 tokens = 0.1667 in [0.15, 0.30)
    (3, '<html><body><p>alpha beta gamma delta epsilon zeta eta theta '
        'iota kappa the of</p></body></html>'),
    # inline markup + entities inside an anchor still count as link chars
    (4, '<html><body><div><a href="/x"><b>Bold &amp; loud</b></a>'
        ' tail</a></div></body></html>'),
    # nothing extractable
    (5, '<html><body></body></html>'),
]


@pytest.fixture(scope="module")
def paras(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, html string")
    rows = boiler.paragraphs(df).collect()
    return {(r["id"], r["para_idx"]): r for r in rows}


def _verdicts(paras, doc):
    return [paras[k]["verdict"] for k in sorted(paras) if k[0] == doc]


def test_rule_branches(paras):
    assert _verdicts(paras, 1) == [
        "short",      # pagetitle
        "bad",        # nav: link density ~1
        "good",       # body: 8/17 stopwords
        "bad",        # link list
        "short",      # Short.
        "bad",        # footer: zero stopwords
    ]


def test_script_dropped_and_zero_stop_bad(paras):
    v = [(k, paras[k]) for k in sorted(paras) if k[0] == 2]
    assert len(v) == 1
    r = v[0][1]
    assert "the" not in r["text"]          # script content gone
    assert r["n_stop"] == 0 and r["verdict"] == "bad"


def test_neargood_band(paras):
    r = [paras[k] for k in sorted(paras) if k[0] == 3][0]
    assert r["n_tokens"] == 12 and r["n_stop"] == 2
    assert r["verdict"] == "neargood"


def test_anchor_chars_through_markup_and_entities(paras):
    r = [paras[k] for k in sorted(paras) if k[0] == 4][0]
    assert r["text"] == "Bold & loud tail"
    assert r["link_chars"] == len("Bold & loud")
    assert r["verdict"] == "bad"           # 11/16 > 0.35


def test_empty_page_yields_nothing(paras):
    assert not [k for k in paras if k[0] == 5]


def test_main_content_order_and_neargood(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, html string")
    m = {r["id"]: r for r in boiler.main_content(df).collect()}
    assert m[1]["main_text"].startswith("the quick brown fox")
    assert m[1]["n_good"] == 1 and m[1]["n_short"] == 2 and m[1]["n_bad"] == 3
    assert m[3]["main_chars"] == 0         # neargood excluded by default
    m2 = {r["id"]: r
          for r in boiler.main_content(df, keep_neargood=True).collect()}
    assert m2[3]["main_text"].startswith("alpha beta")
    assert 5 not in m


def test_binary_html_decodes(spark):
    df = (spark.createDataFrame(PAGES[:1], "doc_id long, html string")
          .select("doc_id", F.encode("html", "UTF-8").alias("html")))
    rows = boiler.paragraphs(df).collect()
    assert any(r["verdict"] == "good" for r in rows)


def test_sql_twin_parity(spark):
    """main_content_sql replays the whole pipeline bit-identically."""
    df = spark.createDataFrame(PAGES, "doc_id long, html string")
    got = sorted(
        tuple(r) for r in boiler.main_content(df)
        .select(F.col("id").alias("doc_id"), "n_paras", "n_good", "n_near",
                "n_short", "n_bad", "main_chars",
                F.md5("main_text").alias("main_fp")).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE pages_src (doc_id BIGINT, h VARCHAR)")
    con.executemany("INSERT INTO pages_src VALUES (?, ?)", PAGES)
    sql = boiler.main_content_sql("SELECT doc_id, h FROM pages_src")
    ref = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert [tuple(map(str, g)) for g in got] == \
        [tuple(map(str, r)) for r in ref]
