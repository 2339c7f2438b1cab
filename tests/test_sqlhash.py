"""Parity of the DuckDB SQL u64 hash generators with the numpy engine
primitives: splitmix64, wrap-around mul/add, md5-prefix token hash."""

import numpy as np
import duckdb
import pytest

from fatespark.corpus import splitmix64
from fatespark import sqlhash as sh


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _vals():
    rng = np.random.default_rng(7)
    v = rng.integers(0, 1 << 64, size=200, dtype=np.uint64)
    edge = np.array([0, 1, 2**32 - 1, 2**32, 2**63 - 1, 2**63,
                     2**64 - 1, sh.C1, sh.C2, sh.C3], dtype=np.uint64)
    return np.concatenate([edge, v])


def test_splitmix64_sql_matches_numpy(con):
    import pandas as pd
    v = _vals()
    con.register("vals", pd.DataFrame({"x": [str(int(x)) for x in v]}))
    steps, out = sh.splitmix64_steps("xx", "s")
    q = f"""
    SELECT {sh.select_steps([('xx', 'x::HUGEINT')] + steps)}
    FROM vals"""
    got = [int(r[-1]) for r in con.execute(q).fetchall()]
    want = [int(x) for x in splitmix64(v)]
    assert got == want


def test_mul_add_wrap(con):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 64, size=100, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=100, dtype=np.uint64)
    import pandas as pd
    con.register("ab", pd.DataFrame({"a": [str(int(x)) for x in a],
                                     "b": [str(int(x)) for x in b]}))
    rows = con.execute(
        f"SELECT {sh.mul64('a::HUGEINT', 'b::HUGEINT')},"
        f" {sh.add64('a::HUGEINT', 'b::HUGEINT')} FROM ab").fetchall()
    with np.errstate(over="ignore"):
        wm = a * b
        wa = a + b
    assert [int(r[0]) for r in rows] == [int(x) for x in wm]
    assert [int(r[1]) for r in rows] == [int(x) for x in wa]


def test_md5_u64(con):
    toks = ["the", "of", "fates", "Любовная", "a", "", "doc003",
            "term01234"]
    import pandas as pd
    con.register("tk", pd.DataFrame({"s": toks}))
    rows = con.execute(f"SELECT {sh.md5_u64('s')} FROM tk").fetchall()
    assert [int(r[0]) for r in rows] == [sh.md5_u64_py(t) for t in toks]


def test_to_i64(con):
    vals = [0, 1, 2**63 - 1, 2**63, 2**64 - 1]
    got = [con.execute(
        f"SELECT {sh.to_i64(sh.u64_lit(v))}").fetchone()[0] for v in vals]
    want = [int(np.uint64(v).astype(np.int64)) for v in vals]
    assert got == want
