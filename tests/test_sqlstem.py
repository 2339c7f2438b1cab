"""The SQL Porter twin (sqlstem.porter_stages_sql) must agree with the
Python stemmer (stem.porter_stem) on the published goldens, edge shapes,
and generated word material — it is the independence of the
ft_stemmed_topk oracle."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fatespark.sqlstem import porter_stages_sql
from fatespark.stem import porter_stem

from test_stem import GOLDEN

EDGES = ["", "a", "be", "sky", "yyy", "yyyy", "oaten", "toy", "crying",
         "énergie", "abc123", "a%b", "x_y", "sses", "ies", "eed", "ing",
         "bled", "sized", "hopping", "falling", "filing", "agreement",
         "ss", "s", "ed", "cease", "controll", "roll", "ional", "tional"]


def sql_stem(words: list[str]) -> dict[str, str]:
    con = duckdb.connect()
    con.execute("CREATE TABLE v0 AS SELECT unnest(?) AS term", [words])
    return dict(con.execute(
        f"WITH {porter_stages_sql('v0')} SELECT term, stem FROM vstem"
    ).fetchall())


def test_goldens_and_edges():
    words = [w for w in set(GOLDEN) | set(EDGES) if w]
    got = sql_stem(words)
    exp = {w: porter_stem(w) for w in words}
    assert got == exp


@pytest.mark.parametrize("suffix", ["ational", "ization", "fulness",
                                    "iveness", "biliti", "icate", "alize",
                                    "ement", "ible", "ance", "ize", "ion"])
def test_rule_suffixes_on_stems(suffix):
    bases = ["gener", "re", "x", "nat", "oper", "consol", "form", "triplic"]
    words = [b + suffix for b in bases]
    assert sql_stem(words) == {w: porter_stem(w) for w in words}


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abcdefghilmnoprstyz", min_size=1,
                        max_size=14), min_size=1, max_size=40, unique=True))
def test_random_lowercase_words(words):
    assert sql_stem(words) == {w: porter_stem(w) for w in words}
