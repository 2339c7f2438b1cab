"""General HTML extraction: rule-by-rule semantics + the corpus-wrapper
byte-identity invariant shared with ``analysis.extract_text``."""

import pandas as pd

from fatespark.analysis import extract_text
from fatespark.htmlx import extract_pages, extracted_text_col


def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame(pd.DataFrame({"html": [html.encode()]}))
    return df.select(extracted_text_col("html").alias("t")) \
        .collect()[0]["t"]


class TestHtmlExtract:
    def test_corpus_wrapper_byte_identical(self, spark):
        import numpy as np
        from fatespark.corpus import pages_pandas
        pdf = pages_pandas(np.arange(50))
        got = extract_pages(
            spark.createDataFrame(pdf[["url", "html"]]),
            out_col="t", normalize_ws=False).select("url", "t").toPandas()
        want = {u: extract_text(h)
                for u, h in zip(pdf["url"], pdf["html"])}
        for u, t in zip(got["url"], got["t"]):
            assert t == want[u]

    def test_script_style_comment_dropped(self, spark):
        h = ('<html><head><style>b { x: 1; }</style></head><body>'
             '<script>if (1 < 2) { alert("a>b"); }</script>'
             '<!-- hidden < > text -->keep</body></html>')
        assert _extract_one(spark, h) == "keep"

    def test_noscript_and_case_insensitive(self, spark):
        h = "<BODY><NOSCRIPT>no js</NOSCRIPT><P>a</P><p>b</p></BODY>"
        assert _extract_one(spark, h) == "a b"

    def test_entities_amp_last(self, spark):
        # double-encoded &amp;lt; must yield the literal string '&lt;'
        h = "<p>x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt; y</p>"
        assert _extract_one(spark, h) == 'x <tag> "q" \'s\' &lt; y'

    def test_tags_become_separators(self, spark):
        assert _extract_one(spark, "<p>a</p><p>b</p>") == "a b"
        assert _extract_one(
            spark, "a<br/>b\n\n  c\t d") == "a b c d"

    def test_nbsp_and_trim(self, spark):
        assert _extract_one(
            spark, "<p>&nbsp;a&nbsp;&nbsp;b </p>") == "a b"
