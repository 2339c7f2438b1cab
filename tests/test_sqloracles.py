"""sqloracles: the DuckDB twins must replicate the engine kernels bit-exactly
on a tiny corpus — checked here WITHOUT Spark, against the numpy batch
kernels the Arrow UDFs run (dedup/ann), so the property is about the math,
not the plumbing."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from fatespark import ann, dedup, sqloracles


@pytest.fixture(scope="module")
def con():
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["the cat sat on the mat",
                 "the cat sat on the mat today and yesterday",
                 "completely different words entirely here now",
                 "the cat sat on the mat",   # exact dup of 1
                 "",                          # empty -> sig sentinel path
                 "one two"],                  # < k tokens
    })
    c = duckdb.connect()
    c.register("documents", docs)
    return c, docs


def _engine_simhash(texts):
    th, lens = dedup._batch_token_hashes(texts)
    # replicate simhash_col_df's kernel on one batch
    import numpy as np
    seed_c = np.uint64(int(dedup.splitmix64(np.uint64(99))))
    out = np.zeros(len(texts), dtype=np.int64)
    if th.size:
        with np.errstate(over="ignore"):
            ths = dedup.splitmix64(th ^ seed_c)
        start = 0
        for d, ln in enumerate(lens):
            h = ths[start:start + ln]
            start += ln
            if not ln:
                continue
            uniq, counts = np.unique(h, return_counts=True)
            acc = np.zeros(64)
            for b in range(64):
                bit = ((uniq >> np.uint64(b)) & np.uint64(1)).astype(float)
                acc[b] = ((2.0 * bit - 1.0) * counts).sum()
            sh = np.uint64(0)
            for b in np.flatnonzero(acc > 0):
                sh |= np.uint64(1) << np.uint64(b)
            out[d] = np.int64(sh.astype(np.int64))
    return out


class TestSimhashTwin:
    def test_simhash_values_bit_exact(self, con):
        c, docs = con
        sql = sqloracles.simhash_pairs_sql()
        inner = sql.split("banded AS")[0].rstrip().rstrip(",") + \
            "\nSELECT doc_id, simhash FROM allsh ORDER BY doc_id"
        got = c.sql(inner).df()["simhash"].tolist()
        want = _engine_simhash(docs["text"].tolist()).tolist()
        assert got == want


class TestMinhashTwin:
    def test_signature_minima_bit_exact(self, con):
        c, docs = con
        sql = sqloracles.minhash_pairs_sql()
        inner = sql.split("bands AS")[0].rstrip().rstrip(",") + \
            "\nSELECT doc_id, list(v ORDER BY i) AS sig FROM sig GROUP BY doc_id ORDER BY doc_id"
        got = {int(r["doc_id"]): list(r["sig"])
               for _, r in c.sql(inner).df().iterrows()}
        seeds = dedup.splitmix64(
            np.arange(64, dtype=np.uint64)
            + np.uint64(7) * np.uint64(0x9E3779B9))
        for i, text in enumerate(docs["text"]):
            sh = dedup._shingle_hashes(text, 3)
            if sh.size == 0:
                want = [np.iinfo(np.int64).max] * 64
            else:
                with np.errstate(over="ignore"):
                    m = dedup.splitmix64(sh[:, None] ^ seeds[None, :])
                want = m.min(axis=0).view(np.int64).tolist()
            assert got[docs["doc_id"][i]] == want, text

    def test_k_guard(self):
        with pytest.raises(NotImplementedError):
            sqloracles.minhash_pairs_sql(k=4)

    def test_exact_dup_pair_survives(self, con):
        c, _ = con
        pairs = c.sql(sqloracles.minhash_pairs_sql(threshold=0.9)
                      + "\nORDER BY id_a, id_b").df()
        # (1,4): exact dups. (5,6): both below k tokens -> both get the
        # sentinel signature, same as the engine (minhash_signatures fills
        # int64-max for shingle-less docs), so they pair at est=1.0.
        assert [(r["id_a"], r["id_b"]) for _, r in pairs.iterrows()] == \
            [(1, 4), (5, 6)]


class TestBucketTwin:
    def test_bucket_expr_matches_plane_dots(self):
        rng = np.random.default_rng(2)
        vecs = rng.normal(size=(40, 16))
        planes = ann.hyperplanes(16, 8, seed=5)
        want = ann.lsh_bucket_of(vecs, planes).tolist()
        emb = pd.DataFrame({
            "vec_id": range(40),
            "embedding": [v.astype(np.float32).tolist() for v in vecs]})
        c = duckdb.connect()
        c.register("e", emb)
        # engine receives float32 from parquet and widens; mirror that here
        vecs32 = np.stack(emb["embedding"].map(np.asarray)).astype(np.float64)
        want32 = ann.lsh_bucket_of(vecs32, planes).tolist()
        be = sqloracles.bucket_expr("embedding", planes)
        got = c.sql(
            f"SELECT {be} AS b FROM e ORDER BY vec_id").df()["b"].tolist()
        assert got == want32
        # and float32 quantization is the only possible divergence source
        assert sum(a != b for a, b in zip(want, want32)) <= 2
