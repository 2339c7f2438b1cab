"""Span-family queries: SpanFirstQuery and SpanNotQuery parity."""

import pytest

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.local import LocalSearchIndex
from fatespark.query import SearchIndex

DOCS = [
    (1, "merge scan deep in the body merge scan"),  # spans at 0 and 6
    (2, "alpha beta merge scan"),                   # span at 2 (end 4)
    (3, "merge scan"),                              # span at 0 (end 2)
    (4, "alpha merge scan error trail"),            # scan followed by error
    (5, "error merge scan clean"),                  # error BEFORE the span
    (6, "merge scan error merge scan clean here"),  # one poisoned, one not
    (7, "nothing relevant"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_root):
    d = str(tmp_root / "span_idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0)).build(
        spark, df, id_col="doc_id", url_col="doc_id", text_col="text",
        build_id="span")
    return SearchIndex(spark, d), LocalSearchIndex(d)


def _ids(df):
    rows = df.collect() if hasattr(df, "collect") else df.itertuples()
    return {getattr(r, "doc_id", None) or r["doc_id"] for r in df.collect()} \
        if hasattr(df, "collect") else {r["doc_id"] for _, r in df.iterrows()}


def _rows(df):
    if hasattr(df, "collect"):
        return sorted((r["doc_id"], round(r["score"], 9))
                      for r in df.collect())
    return sorted((int(r["doc_id"]), round(float(r["score"]), 9))
                  for _, r in df.iterrows())


class TestSpanFirst:
    def test_end_bound(self, idx):
        si, _ = idx
        # spans: d1 (0,2)+(6,8); d2 (2,4); d3 (0,2); d4 (1,3); d5 (1,3);
        # d6 (0,2)+(3,5)
        assert {r["doc_id"] for r in
                si.search_span_first("merge scan", 2).collect()} == {1, 3, 6}
        assert {r["doc_id"] for r in
                si.search_span_first("merge scan", 4).collect()} \
            == {1, 2, 3, 4, 5, 6}

    def test_tf_counts_only_qualifying_spans(self, idx):
        si, _ = idx
        v = si._phrase_variants("merge scan")
        wide = {r["doc_id"]: r["tf"] for r in
                si._phrase_matches(v, max_end=100).collect()}
        tight = {r["doc_id"]: r["tf"] for r in
                 si._phrase_matches(v, max_end=2).collect()}
        # doc 1 has 2 spans total but only 1 early
        assert wide[1] == 2 and tight[1] == 1

    def test_validation(self, idx):
        si, _ = idx
        with pytest.raises(ValueError):
            si.search_span_first("merge scan", 0)

    def test_reader_parity(self, idx):
        si, li = idx
        assert _rows(si.search_span_first("merge scan", 4, quantize=4)) \
            == _rows(li.search_span_first("merge scan", 4, quantize=4))


class TestSpanNot:
    def test_post_zone(self, idx):
        si, _ = idx
        # exclude 'error' with post=1: a span whose next token is error dies
        got = {r["doc_id"] for r in
               si.search_span_not("merge scan", "error", post=1).collect()}
        # doc 4 dies (scan error); doc 6 keeps its second span; doc 5's
        # error is BEFORE the span (pre=0) so it survives
        assert got == {1, 2, 3, 5, 6}

    def test_pre_zone(self, idx):
        si, _ = idx
        got = {r["doc_id"] for r in
               si.search_span_not("merge scan", "error",
                                  pre=1, post=1).collect()}
        # pre=1 kills doc 5 (error just before its span) AND doc 6's
        # second span (error at start-1), leaving doc 6 span-less
        assert got == {1, 2, 3}

    def test_zero_slack_requires_overlap(self, idx):
        si, _ = idx
        # pre=post=0: exclusion only when the exclude term is INSIDE the
        # span — never true here, so everything with the phrase matches
        got = {r["doc_id"] for r in
               si.search_span_not("merge scan", "error").collect()}
        assert got == {1, 2, 3, 4, 5, 6}

    def test_absent_exclude_is_noop(self, idx):
        si, _ = idx
        a = _rows(si.search_span_not("merge scan", "zzznope", post=3,
                                     quantize=4))
        b = _rows(si.search_phrase("merge scan", quantize=4))
        assert a == b

    def test_tf_counts_surviving_spans(self, idx):
        si, _ = idx
        v = si._phrase_variants("merge scan")
        full = {r["doc_id"]: r["tf"] for r in
                si._phrase_matches(v).collect()}
        cut = {r["doc_id"]: r["tf"] for r in
               si._phrase_matches(v, exclude=["error"],
                                  post=1).collect()}
        # doc 6 loses its first span (error at end-1+post) but keeps the
        # second; doc 4 loses its only span
        assert full[6] == 2 and cut[6] == 1
        assert 4 in full and 4 not in cut

    def test_reader_parity(self, idx):
        si, li = idx
        assert _rows(si.search_span_not("merge scan", "error", pre=1,
                                        post=1, quantize=4)) \
            == _rows(li.search_span_not("merge scan", "error", pre=1,
                                        post=1, quantize=4))

    def test_validation(self, idx):
        si, _ = idx
        with pytest.raises(ValueError):
            si.search_span_not("merge scan", "error", pre=-1)
        with pytest.raises(ValueError):
            si.search_span_not("merge scan", "")


class TestSpanOr:
    def test_union_and_tf(self, idx):
        si, _ = idx
        v = (si._phrase_variants("merge scan")
             + si._phrase_variants("alpha beta"))
        m = {r["doc_id"]: r["tf"] for r in si._phrase_matches(v).collect()}
        # doc 2 "alpha beta merge scan" matches BOTH clauses: tf 2
        assert m[2] == 2
        # doc 1 matches only "merge scan", twice
        assert m[1] == 2
        assert 7 not in m

    def test_clause_lengths_may_differ(self, idx):
        si, _ = idx
        got = {r["doc_id"] for r in si.search_phrases_any(
            ["merge scan error", "clean"]).collect()}
        # 3-token clause hits docs 4 and 6; 1-token clause hits 5 and 6
        assert got == {4, 5, 6}

    def test_superset_of_each_clause(self, idx):
        si, _ = idx
        both = {r["doc_id"] for r in si.search_phrases_any(
            ["merge scan", "alpha beta"]).collect()}
        a = {r["doc_id"] for r in si.search_phrase("merge scan").collect()}
        b = {r["doc_id"] for r in si.search_phrase("alpha beta").collect()}
        assert both == a | b

    def test_reader_parity(self, idx):
        si, li = idx
        assert _rows(si.search_phrases_any(
            ["merge scan", "clean"], quantize=4)) \
            == _rows(li.search_phrases_any(
                ["merge scan", "clean"], quantize=4))

    def test_empty_input(self, idx):
        si, _ = idx
        assert si.search_phrases_any([]).count() == 0


class TestSpanWithin:
    def test_enclosed_only(self, idx):
        si, _ = idx
        # scans preceded by merge are enclosed; d7 has no span at all
        tf = {r["doc_id"]: r["tf"] for r in si._enclosure_matches(
            [["scan"]], [["merge", "scan"]], "within").collect()}
        assert tf == {1: 2, 2: 1, 3: 1, 4: 1, 5: 1, 6: 2}

    def test_outside_little_never_counts(self, idx):
        si, _ = idx
        # 'deep' (d1 pos 2) is never inside a 'merge scan' span
        assert si.search_span_within(
            "deep", "merge scan").count() == 0

    def test_spanor_little_counts_each_span(self, idx):
        si, _ = idx
        tf = {r["doc_id"]: r["tf"] for r in si._enclosure_matches(
            [["merge"], ["scan"]], [["merge", "scan"]],
            "within").collect()}
        # both little terms enclosed per big occurrence -> 2x span count
        assert tf == {1: 4, 2: 2, 3: 2, 4: 2, 5: 2, 6: 4}

    def test_equal_span_encloses_itself(self, idx):
        si, _ = idx
        tf = {r["doc_id"]: r["tf"] for r in si._enclosure_matches(
            [["merge", "scan"]], [["merge", "scan"]],
            "within").collect()}
        assert tf == {1: 2, 2: 1, 3: 1, 4: 1, 5: 1, 6: 2}

    def test_mixed_big_lengths(self, idx):
        si, _ = idx
        # 'deep' only inside the 3-token big clause (d1: merge scan deep)
        tf = {r["doc_id"]: r["tf"] for r in si._enclosure_matches(
            [["deep"]], [["merge", "scan"], ["merge", "scan", "deep"]],
            "within").collect()}
        assert tf == {1: 1}

    def test_reader_parity(self, idx):
        si, li = idx
        assert _rows(si.search_span_within(
            ["merge", "scan"], "merge scan", quantize=4)) == \
            _rows(li.search_span_within(
                ["merge", "scan"], "merge scan", quantize=4))


class TestSpanContaining:
    def test_big_without_little_drops(self, idx):
        si, _ = idx
        # no 'merge scan' span ever contains 'error'
        assert si.search_span_containing(
            "merge scan", "error").count() == 0

    def test_contains_little(self, idx):
        si, _ = idx
        # only the 'scan deep' span (d1) contains 'deep'
        tf = {r["doc_id"]: r["tf"] for r in si._enclosure_matches(
            [["merge", "scan"], ["scan", "deep"]], [["deep"]],
            "containing").collect()}
        assert tf == {1: 1}

    def test_missing_side_empty(self, idx):
        si, _ = idx
        assert si.search_span_containing(
            "merge scan", "zzz_absent").count() == 0
        assert si.search_span_within(
            "zzz_absent", "merge scan").count() == 0

    def test_reader_parity(self, idx):
        si, li = idx
        assert _rows(si.search_span_containing(
            ["merge scan", "scan deep"], "deep", quantize=4)) == \
            _rows(li.search_span_containing(
                ["merge scan", "scan deep"], "deep", quantize=4))
