"""Corpus generator: determinism and fixture invariants (FIXTURES F1/F2)."""

import numpy as np
import pandas as pd

from fatespark.analysis import extract_text
from fatespark.corpus import contacts_pandas, pages_pandas, splitmix64


def test_splitmix64_deterministic():
    a = splitmix64(np.arange(10, dtype=np.uint64))
    b = splitmix64(np.arange(10, dtype=np.uint64))
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == 10


def test_pages_partition_invariance():
    """Rows depend only on id — identical whether generated in one batch or
    many (the Spark mapInPandas generator sees arbitrary batch splits)."""
    ids = np.arange(0, 50, dtype=np.uint64)
    whole = pages_pandas(ids)
    parts = pd.concat([pages_pandas(ids[:13]), pages_pandas(ids[13:29]),
                       pages_pandas(ids[29:])], ignore_index=True)
    pd.testing.assert_frame_equal(whole, parts)


def test_pages_html_text_byte_identical():
    df = pages_pandas(np.arange(0, 30, dtype=np.uint64))
    for html, text in zip(df["html"], df["text"]):
        assert extract_text(html) == text


def test_pages_shape_and_bounds():
    df = pages_pandas(np.arange(0, 200, dtype=np.uint64))
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert df["url"].is_unique
    lens = df["text"].str.split().str.len()
    assert lens.min() >= 20 and lens.max() <= 200
    assert set(df["lang"].unique()) <= {"en", "ru", "de"}
    assert (df["lang"] == "en").mean() > 0.8


def test_pages_zipf_head_terms_present():
    df = pages_pandas(np.arange(0, 500, dtype=np.uint64))
    blob = " ".join(df["text"])
    assert " the " in f" {blob} "
    # mid-frequency special tokens appear somewhere in a 500-doc sample
    assert "Smith" in blob or "smith" in blob


def test_contacts_deterministic_and_head_name():
    df = contacts_pandas(5000)
    df2 = contacts_pandas(5000)
    pd.testing.assert_frame_equal(df, df2)
    assert (df["last_name"] == "Smith").sum() > 200  # head term
    assert df["id"].iloc[0] == 1 and df["id"].iloc[-1] == 5000
