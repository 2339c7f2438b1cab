"""Training-data pipeline operators: text analysis, dedup, ANN, multimodal."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fatespark import ann, dedup, multimodal, textops


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat sat on the mat", "en"),           # exact dup of 1
        (3, "the cat sat on the mat today", "en"),     # near dup of 1
        (4, "Der Hund ist nicht ein Tier und das", "de"),
        (5, "Любовная история и война и мир", "ru"),
        (6, "completely different text about searching indexes", "en"),
        (7, "THE CAT SAT ON THE MAT", "en"),           # case-dup of 1
        (8, "!!! ??? ... 123 456", "xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestTextOps:
    def test_token_count(self, docs_df):
        got = {r["doc_id"]: r["n"] for r in docs_df.select(
            "doc_id", textops.token_count_col("text").alias("n")).collect()}
        assert got[1] == 6 and got[8] == 5 and got[5] == 6

    def test_fingerprint_folds_and_collapses(self, docs_df):
        got = {r["doc_id"]: r["fp"] for r in docs_df.select(
            "doc_id", textops.fingerprint_col("text").alias("fp")).collect()}
        assert got[1] == got[2] == got[7]
        assert got[1] != got[3]

    def test_lang_pred(self, docs_df):
        got = {r["doc_id"]: r["lp"] for r in docs_df.select(
            "doc_id", textops.lang_pred_col("text").alias("lp")).collect()}
        assert got[1] == "en" and got[4] == "de" and got[5] == "ru"

    def test_quality_score_ordering(self, docs_df):
        got = {r["doc_id"]: r["q"] for r in docs_df.select(
            "doc_id", textops.quality_score_col("text").alias("q")).collect()}
        assert got[1] > got[8]  # real text beats punctuation soup
        assert 0.0 <= min(got.values()) and max(got.values()) <= 1.0

    def test_punct_ratio(self, docs_df):
        got = {r["doc_id"]: r["p"] for r in docs_df.select(
            "doc_id", textops.punct_ratio_col("text").alias("p")).collect()}
        assert got[8] > 0.4 and got[1] == 0.0


class TestDedup:
    def test_exact_groups(self, docs_df):
        groups = dedup.exact_duplicate_groups(docs_df).collect()
        dup = [g for g in groups if g["n_docs"] > 1]
        assert len(dup) == 1
        assert dup[0]["n_docs"] == 3 and dup[0]["keep_id"] == 1

    def test_exact_dedup_keeps_representatives(self, docs_df):
        kept = sorted(r["doc_id"] for r in
                      dedup.exact_dedup(docs_df).select("doc_id").collect())
        assert kept == [1, 3, 4, 5, 6, 8]

    def test_ngram_jaccard(self, docs_df):
        pairs = dedup.ngram_jaccard_pairs(docs_df, k=3, threshold=0.5).collect()
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
        assert (1, 2) in got and got[(1, 2)] == 1.0
        assert (1, 7) in got and (2, 7) in got
        assert (1, 3) in got  # 4/5 shared shingles... >= 0.5
        assert all(a < b for a, b in got)

    def test_minhash_lsh_finds_exact_dups(self, docs_df):
        pairs = dedup.minhash_dedup_pairs(docs_df, threshold=0.9,
                                          num_hashes=32, bands=8).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert {(1, 2), (1, 7), (2, 7)} <= got
        assert (1, 6) not in got

    def test_minhash_estimate_tracks_true_jaccard(self, spark):
        # two docs with known shingle overlap; estimate within ~0.2
        a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
        b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 xx yy"
        df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
        sigs = dedup.minhash_signatures(df, num_hashes=128)
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        est = dedup.minhash_jaccard_estimate(sigs, pairs).collect()[0]["jaccard_est"]
        sh_a = dedup._shingle_hashes(a, 3)
        sh_b = dedup._shingle_hashes(b, 3)
        true_j = np.intersect1d(sh_a, sh_b).size / np.union1d(sh_a, sh_b).size
        assert abs(est - true_j) < 0.2

    def test_simhash_near_pairs(self, docs_df):
        pairs = dedup.simhash_near_pairs(docs_df, max_hamming=3).collect()
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
        assert got.get((1, 2)) == 0 and got.get((1, 7)) == 0
        assert (1, 6) not in got

    def test_embedding_dup_pairs(self, spark):
        rows = [(1, [1.0, 0.0, 0.0]), (2, [0.99, 0.01, 0.0]),
                (3, [0.0, 1.0, 0.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = dedup.embedding_dup_pairs(df, threshold=0.95).collect()
        assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


class TestANN:
    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(200, 16))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        rows = [(i, vecs[i].tolist()) for i in range(200)]
        return (spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
                vecs)

    def test_bruteforce_matches_numpy(self, emb_df):
        df, vecs = emb_df
        q = vecs[0]
        got = [(r["vec_id"], r["cosine"]) for r in
               ann.cosine_topk(df, q.tolist(), k=5).collect()]
        sims = vecs @ q
        order = np.lexsort((np.arange(200), -sims))[:5]
        assert [g[0] for g in got] == order.tolist()
        assert got[0][0] == 0 and abs(got[0][1] - 1.0) < 1e-9

    def test_lsh_recall_at_10(self, emb_df):
        df, vecs = emb_df
        q = vecs[7]
        exact = {r["vec_id"] for r in ann.cosine_topk(df, q.tolist(), k=10).collect()}
        approx = {r["vec_id"] for r in
                  ann.lsh_topk(df, q.tolist(), k=10, n_planes=8,
                               n_probes=64).collect()}
        # with 64/256 buckets probed, recall should be decent and the query
        # itself must always be found (it hashes to its own bucket)
        assert 7 in approx
        assert len(exact & approx) >= 5

    def test_lsh_bucket_deterministic(self):
        planes = ann.hyperplanes(16, 12, seed=5)
        v = np.ones((3, 16))
        b1 = ann.lsh_bucket_of(v, planes)
        b2 = ann.lsh_bucket_of(v, ann.hyperplanes(16, 12, seed=5))
        assert np.array_equal(b1, b2)


class TestMultimodal:
    @pytest.fixture(scope="class")
    def img_df(self, spark):
        rows = [(i, multimodal.fake_image_bytes(i, 8, 4)) for i in range(10)]
        return spark.createDataFrame(rows, "doc_id long, payload binary")

    def test_image_metadata(self, img_df):
        meta = {r["doc_id"]: r for r in multimodal.image_metadata(img_df).collect()}
        assert len(meta) == 10
        assert meta[3]["width"] == 8 and meta[3]["height"] == 4
        assert meta[3]["n_pixels"] == 32
        _, _, px = multimodal.decode_image(multimodal.fake_image_bytes(3, 8, 4))
        assert meta[3]["mean_px"] == float(px.mean())

    def test_image_features_shape(self, img_df):
        feats = multimodal.image_features(img_df, n_bins=16).collect()
        assert all(len(r["features"]) == 16 for r in feats)
        assert all(abs(sum(r["features"]) - 1.0) < 1e-5 for r in feats)

    def test_audio_metadata(self, spark):
        rows = [(i, multimodal.fake_audio_bytes(i)) for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        meta = multimodal.audio_metadata(df).collect()
        assert all(r["sample_rate"] == 16000 and r["n_samples"] == 64
                   for r in meta)

    def test_real_format_rejected_loudly(self):
        # JPEG pixels now decode for real (fatespark.jpeg); a truncated
        # stream is a loud ValueError, not a silent guess
        with pytest.raises(ValueError):
            multimodal.decode_image(b"\xff\xd8\xff\xe0fakejpeg")
        with pytest.raises(NotImplementedError, match="png"):
            multimodal.decode_image(b"\x89PNG\r\n")   # truncated magic
        with pytest.raises(ValueError):   # truncated GIF: loud, not gated
            multimodal.decode_image(b"GIF89a" + bytes(16))
        with pytest.raises(NotImplementedError, match="wav/avi"):
            multimodal.decode_image(b"RIFF" + bytes(16))   # AVI container

    def test_frame_sampling(self, spark):
        video = b"".join(multimodal.fake_image_bytes(1, 4, 4)
                         for _ in range(10))
        df = spark.createDataFrame([(1, video)], "doc_id long, payload binary")
        frames = multimodal.sample_frames(df, every_n=4).collect()
        assert [r["frame_idx"] for r in frames] == [0, 4, 8]
        w, h, _ = multimodal.decode_image(bytes(frames[0]["frame"]))
        assert (w, h) == (4, 4)


class TestIdentifierCount:
    def test_matches_reference_analyzer_semantics(self, spark):
        """JVM identifier_count_col == len(identifier tokenizer output) on
        the reference's golden strings (simple_identifier_analyzer_test.rb:
        9-33: '1' and '$@!' yield nothing)."""
        from fatespark.analysis import identifier_tokens
        cases = ["fat_entry", "1", "$@!", "a b2 _x 9y", "", None,
                 "foo-bar baz_9 42x"]
        pdf = pd.DataFrame({"doc_id": range(len(cases)), "text": cases})
        df = spark.createDataFrame(pdf)
        got = {r["doc_id"]: r["n"] for r in df.select(
            "doc_id", textops.identifier_count_col("text").alias("n")
        ).collect()}
        for i, c in enumerate(cases):
            assert got[i] == len(identifier_tokens(c or "")), c


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestEmbeddingDedupScale:
    """The tiled exact join and the LSH-banded scale path (VERDICT r01 #3:
    no cartesian/BroadcastNestedLoopJoin anywhere in the embedding-dedup
    plans)."""

    @pytest.fixture(scope="class")
    def emb50(self, spark):
        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(50, 16))
        vecs[25] = vecs[5] + 0.02 * rng.normal(size=16)   # planted near-dup
        vecs[40] = vecs[12] + 0.02 * rng.normal(size=16)  # planted near-dup
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(50)],
            "vec_id long, embedding array<double>")
        return df, vecs

    @staticmethod
    def _brute_pairs(vecs, threshold):
        sims = vecs @ vecs.T
        out = set()
        for i in range(len(vecs)):
            for j in range(i + 1, len(vecs)):
                if sims[i, j] >= threshold:
                    out.add((i, j))
        return out

    def test_tiled_equals_bruteforce(self, emb50):
        df, vecs = emb50
        got = {(r["id_a"], r["id_b"]) for r in
               dedup.embedding_dup_pairs(df, threshold=0.4,
                                         n_blocks=4).collect()}
        assert got == self._brute_pairs(vecs, 0.4)

    def test_tiled_block_count_invariance(self, emb50):
        df, _ = emb50
        one = {(r["id_a"], r["id_b"], round(r["cosine"], 10)) for r in
               dedup.embedding_dup_pairs(df, 0.4, n_blocks=1).collect()}
        five = {(r["id_a"], r["id_b"], round(r["cosine"], 10)) for r in
                dedup.embedding_dup_pairs(df, 0.4, n_blocks=5).collect()}
        assert one == five

    def test_tiled_plan_has_no_cartesian(self, emb50):
        df, _ = emb50
        plan = _physical_plan(dedup.embedding_dup_pairs(df, 0.4, n_blocks=4))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_banded_finds_planted_dups_exactly(self, emb50):
        df, vecs = emb50
        got = {(r["id_a"], r["id_b"]) for r in
               dedup.embedding_dup_pairs_banded(df, threshold=0.95).collect()}
        true = self._brute_pairs(vecs, 0.95)
        assert {(5, 25), (12, 40)} <= true
        # banded candidates are verified with the exact cosine, so output
        # is a subset of truth; at this threshold recall is ~1
        assert got == true

    def test_banded_plan_has_no_cartesian(self, emb50):
        df, _ = emb50
        plan = _physical_plan(dedup.embedding_dup_pairs_banded(df, 0.95))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestLshVectorIndex:
    def test_build_probe_and_physical_pruning(self, spark, tmp_path):
        rng = np.random.default_rng(4)
        vecs = rng.normal(size=(300, 16))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(300)],
            "vec_id long, embedding array<double>")
        idx = ann.LshVectorIndex.build(df, str(tmp_path / "lshidx"), dim=16,
                                       n_planes=6, seed=5)
        q = vecs[7]
        got = idx.topk(spark, q.tolist(), k=10, n_probes=16)
        plan = _physical_plan(got)
        assert "PartitionFilters" in plan and "lsh_bucket" in plan
        rows = got.collect()
        assert rows and rows[0]["vec_id"] == 7  # query finds itself
        exact = {r["vec_id"] for r in
                 ann.cosine_topk(df, q.tolist(), k=10).collect()}
        assert len(exact & {r["vec_id"] for r in rows}) >= 5

    def test_index_probe_matches_adhoc_lsh(self, spark, tmp_path):
        rng = np.random.default_rng(9)
        vecs = rng.normal(size=(120, 8))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(120)],
            "vec_id long, embedding array<double>")
        idx = ann.LshVectorIndex.build(df, str(tmp_path / "idx2"), dim=8,
                                       n_planes=5, seed=5)
        q = vecs[3]
        a = [(r["vec_id"], round(r["cosine"], 9)) for r in
             idx.topk(spark, q.tolist(), k=8, n_probes=8).collect()]
        b = [(r["vec_id"], round(r["cosine"], 9)) for r in
             ann.lsh_topk(df, q.tolist(), k=8, n_planes=5, n_probes=8,
                          seed=5).collect()]
        assert a == b


class TestDupClusters:
    """dedup.dup_clusters: distributed connected components over pair lists,
    checked against a driver-side union-find on the same edges."""

    @staticmethod
    def _uf_components(pairs, ids):
        parent = {i: i for i in ids}
        for a, b in pairs:
            parent.setdefault(a, a)
            parent.setdefault(b, b)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min id per component = cluster id
        comp = {}
        for x in parent:
            r = find(x)
            comp[r] = min(comp.get(r, r), x)
        return {x: comp[find(x)] for x in parent}

    def _check(self, spark, pairs, ids=None, max_iters=64):
        pdf = spark.createDataFrame(
            pairs or [(0, 0)], "id_a long, id_b long")
        if not pairs:
            pdf = pdf.filter("id_a < 0")
        ids_df = (spark.createDataFrame([(i,) for i in ids], "doc_id long")
                  if ids is not None else None)
        got_rows = dedup.dup_clusters(
            pdf, ids_df=ids_df, max_iters=max_iters).collect()
        got = {r["id"]: r["cluster_id"] for r in got_rows}
        want = self._uf_components(pairs, ids or [])
        assert got == want
        # sizes are consistent with the labeling
        from collections import Counter
        sz = Counter(got.values())
        for r in got_rows:
            assert r["cluster_size"] == sz[r["cluster_id"]]

    def test_cliques_chain_and_singletons(self, spark):
        pairs = [(1, 2), (2, 3),            # chain component -> 1
                 (10, 11), (11, 10),        # dup + reversed edges
                 (20, 21), (21, 22), (20, 22),  # triangle
                 (30, 30)]                  # self-loop only: singleton
        self._check(spark, pairs, ids=[1, 2, 3, 10, 11, 20, 21, 22,
                                       30, 40, 41])  # 40, 41 isolated

    def test_long_chain_converges_fast(self, spark):
        # worst-case diameter: a 64-node path; pointer jumping must get
        # there in O(log n) rounds, far under this max_iters cap
        pairs = [(i, i + 1) for i in range(63)]
        self._check(spark, pairs, max_iters=12)

    def test_empty_pairs_all_singletons(self, spark):
        self._check(spark, [], ids=[5, 6, 7])

    def test_random_graphs_match_union_find(self, spark):
        rng = np.random.default_rng(42)
        for trial in range(3):
            n = int(rng.integers(10, 40))
            m = int(rng.integers(0, 60))
            pairs = [(int(a), int(b)) for a, b in
                     rng.integers(0, n, size=(m, 2))]
            pairs = [(a, b) for a, b in pairs]
            self._check(spark, pairs, ids=list(range(n)))

    def test_keep_one_per_cluster(self, spark):
        pairs = [(1, 2), (2, 3), (7, 8)]
        pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
        keep = (dedup.dup_clusters(pdf)
                .filter(F.col("id") == F.col("cluster_id"))
                .select("id").collect())
        assert sorted(r["id"] for r in keep) == [1, 7]


class TestSampling:
    """sampling: deterministic md5-keyed splits / stratified sampling —
    membership must depend only on (seed, key), never on partitioning."""

    @staticmethod
    def _bucket_py(seed, key, buckets=1_000_000):
        import hashlib
        h = int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)
        return h % buckets

    def test_bucket_matches_python_md5(self, spark):
        from fatespark import sampling
        df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
        got = {r["doc_id"]: r["b"] for r in df.select(
            "doc_id", sampling.bucket_col("doc_id", seed="s7").alias("b"))
            .collect()}
        for i in range(200):
            assert got[i] == self._bucket_py("s7", i)

    def test_bucket_matches_duckdb_twin(self, spark):
        import duckdb
        from fatespark import sampling, sqlhash
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT range AS doc_id FROM range(100)")
        dd = dict(con.execute(
            f"SELECT doc_id, {sqlhash.md5_bucket60('doc_id', 'sx', 997)} "
            "FROM t").fetchall())
        df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        sp = {r["doc_id"]: r["b"] for r in df.select(
            "doc_id", sampling.bucket_col("doc_id", seed="sx", buckets=997)
            .alias("b")).collect()}
        assert sp == {k: int(v) for k, v in dd.items()}

    def test_split_assignment_stable_under_repartition(self, spark):
        from fatespark import sampling
        df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = dict(sampling.assign_splits(df, w).select(
            "doc_id", "split").collect())
        b = dict(sampling.assign_splits(df.repartition(13), w).select(
            "doc_id", "split").collect())
        assert a == b
        # ratio sanity on 500 keys
        from collections import Counter
        c = Counter(a.values())
        assert c["train"] > c["val"] and c["train"] > c["test"]
        assert set(c) == {"train", "val", "test"}

    def test_split_weights_validated(self, spark):
        from fatespark import sampling
        df = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError):
            sampling.assign_splits(df, {"train": 0.5, "val": 0.1})

    def test_stratified_sample_exact_by_key(self, spark):
        from fatespark import sampling
        rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        frac = {"en": 0.5, "de": 1.0}
        kept = sorted(r["doc_id"] for r in sampling.stratified_sample(
            df, "lang", frac, default=0.0).collect())
        want = [i for i, lang in rows
                if self._bucket_py("sample", i) <
                int(frac.get(lang, 0.0) * 1_000_000)]
        assert kept == want
        assert all(lang != "zh" for i, lang in rows if i in set(kept))

    def test_shuffle_order_deterministic_and_spread(self, spark):
        from fatespark import sampling
        df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        o1 = [r["doc_id"] for r in df.orderBy(
            sampling.shuffle_order_col("doc_id"), "doc_id").collect()]
        o2 = [r["doc_id"] for r in df.repartition(7).orderBy(
            sampling.shuffle_order_col("doc_id"), "doc_id").collect()]
        assert o1 == o2
        assert o1 != sorted(o1)  # actually shuffled, not storage order


class TestPiiMask:
    """textops.pii_mask_col / pii_count_cols vs the DuckDB RE2 twins — the
    risk is Java-regex/RE2 divergence, so fuzz both engines on texts built
    from PII-shaped fragments plus adversarial near-misses."""

    FRAGMENTS = [
        "bob.smith+tag@ex-a.co.uk", "a@b.cc", "x@y", "@nope", "a@@b.com",
        "1234 5678 9012 3456", "1234-5678-9012-3456", "1234 5678 9012",
        "123-45-6789", "123-456-789", "12-345-6789",
        "10.0.255.1", "999.999.999.999", "1.2.3", "1.2.3.4.5",
        "+44 20 7946 0958", "+1 555-0100", "+999 12 345", "+1x555",
        "plain words", "v1.2.3.4rc", "a.b.c.d", "price $5,300.00",
    ]

    def _fuzz_texts(self, n=60):
        rng = np.random.default_rng(7)
        out = []
        for _ in range(n):
            k = int(rng.integers(1, 6))
            parts = [self.FRAGMENTS[int(i)] for i in
                     rng.integers(0, len(self.FRAGMENTS), size=k)]
            out.append(" ".join(parts))
        return out

    def test_mask_and_counts_match_duckdb(self, spark):
        import duckdb
        import pandas as pd
        from fatespark import sqloracles
        texts = self._fuzz_texts()
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string")
        counts = textops.pii_count_cols("text")
        sp = (df.select("id", textops.pii_mask_col("text").alias("masked"),
                        *[c.alias(n) for n, c in counts.items()])
              .toPandas().sort_values("id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"id": range(len(texts)),
                                        "text": texts}))
        dd = con.sql(
            f"SELECT id, {sqloracles.pii_mask_sql('text')} AS masked, "
            + ", ".join(sqloracles.pii_count_sql('text'))
            + " FROM t ORDER BY id").df()
        pd.testing.assert_frame_equal(sp, dd, check_dtype=False)

    def test_masks_expected_tokens(self, spark):
        df = spark.createDataFrame(
            [(1, "mail a@b.cc card 1111 2222 3333 4444 ip 10.0.0.1 "
                 "call +44 20 7946 0958 ssn 123-45-6789")],
            "id long, text string")
        got = df.select(textops.pii_mask_col("text").alias("m")).first()["m"]
        assert got == ("mail <EMAIL> card <CARD> ip <IP> "
                       "call <PHONE> ssn <SSN>")

    def test_null_text_masks_to_empty(self, spark):
        df = spark.createDataFrame([(1, None)], "id long, text string")
        assert df.select(
            textops.pii_mask_col("text").alias("m")).first()["m"] == ""


class TestBpeCount:
    """BPE-ish pre-tokenizer segment count: Spark (Java regex), DuckDB
    (RE2) and Python re must agree match-for-match, and the segments must
    tile the input exactly (no gaps, no overlaps)."""

    CASES = [
        "Hello world, it's 2026!  multi  space\tand\nnewlines",
        "don't stop-me now... 3.14 x_y+z",
        "", "   ", "weird''quotes'", "a'sb", "CamelCase123abc",
        "кириллица mixed ascii", "I'll we've they'd s't",
        "tab\tsep\tvals 000 a1b2", None,
    ]

    def test_cross_engine_counts(self, spark):
        import re
        import duckdb
        pat = textops.BPE_RE
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.CASES)],
            "doc_id long, text string")
        got = {r["doc_id"]: r["n"] for r in df.select(
            "doc_id",
            textops.bpe_token_count_col("text").alias("n")).collect()}
        for i, t in enumerate(self.CASES):
            s = t or ""
            n_py = len(re.findall(pat, s))
            n_dk = duckdb.sql(
                "select len(regexp_extract_all(?, ?))",
                params=[s, pat]).fetchone()[0]
            assert got[i] == n_py == n_dk, (i, t)

    def test_segments_tile_input(self):
        import re
        pat = textops.BPE_RE
        for t in self.CASES:
            s = t or ""
            assert sum(len(m.group(0))
                       for m in re.finditer(pat, s)) == len(s), t


class TestIvfVectorIndex:
    """IVF coarse quantizer: deterministic training, physical partition
    pruning, probe-widening recall, and exact parity between the persisted
    probe path and a from-scratch retrain (bit-determinism)."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rng = np.random.default_rng(11)
        centers = rng.normal(size=(4, 16)) * 3
        vecs = np.concatenate([c + rng.normal(size=(60, 16))
                               for c in centers])
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, vecs[i].astype(np.float32).tolist())
             for i in range(len(vecs))],
            "vec_id long, embedding array<float>")
        return df, vecs

    def test_train_is_deterministic(self, corpus):
        df, _ = corpus
        a = ann.ivf_train(df.repartition(7), 16, n_centroids=4, n_iters=2)
        b = ann.ivf_train(df.repartition(2), 16, n_centroids=4, n_iters=2)
        assert np.array_equal(a, b)  # bit-identical across partitionings

    def test_build_probe_and_physical_pruning(self, spark, tmp_path,
                                              corpus):
        df, vecs = corpus
        idx = ann.IvfVectorIndex.build(df, str(tmp_path / "ivfidx"),
                                       dim=16, n_centroids=4, n_iters=2)
        q = vecs[7].astype(np.float32).astype(np.float64)
        got = idx.topk(spark, q.tolist(), k=10, n_probes=1)
        plan = _physical_plan(got)
        assert "PartitionFilters" in plan and "ivf_cid" in plan
        rows = got.collect()
        assert rows and rows[0]["vec_id"] == 7  # query finds itself
        # all-cells probe degenerates to exact brute force
        full = [(r["vec_id"], round(r["cosine"], 9)) for r in
                idx.topk(spark, q.tolist(), k=10, n_probes=4).collect()]
        exact = [(r["vec_id"], round(r["cosine"], 9)) for r in
                 ann.cosine_topk(df, q.tolist(), k=10).collect()]
        assert full == exact

    def test_reopened_index_probes_identically(self, spark, tmp_path,
                                               corpus):
        df, vecs = corpus
        path = str(tmp_path / "ivfidx2")
        built = ann.IvfVectorIndex.build(df, path, dim=16, n_centroids=4,
                                         n_iters=2)
        reopened = ann.IvfVectorIndex(path, dim=16, n_centroids=4,
                                      n_iters=2)
        q = vecs[3].astype(np.float32).astype(np.float64).tolist()
        a = [(r["vec_id"], round(r["cosine"], 9)) for r in
             built.topk(spark, q, k=8, n_probes=2).collect()]
        b = [(r["vec_id"], round(r["cosine"], 9)) for r in
             reopened.topk(spark, q, k=8, n_probes=2).collect()]
        assert a == b
        assert np.array_equal(built.centroids(), reopened.centroids())

    def test_empty_corpus_raises(self, spark):
        df = spark.createDataFrame([], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="empty"):
            ann.ivf_train(df, 4, n_centroids=2)


class TestCollocations:
    def test_brute_force_parity(self, spark):
        docs = [(1, "new york new york city"), (2, "New York is big"),
                (3, "big data big data big data"), (4, "solo"),
                (5, None), (6, "")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r["a"], r["b"]): (r["n_ab"], r["pmi"])
               for r in textops.collocations_df(df, min_count=2,
                                                k=100).collect()}
        # brute force
        import math
        from collections import Counter
        uni, big = Counter(), Counter()
        bg_total = 0
        for _, t in docs:
            toks = [x.lower() for x in (t or "").split() if x]
            uni.update(toks)
            big.update(zip(toks, toks[1:]))
            bg_total += max(len(toks) - 1, 0)
        u_total = sum(uni.values())
        want = {}
        for (a, b), n_ab in big.items():
            if n_ab < 2:
                continue
            pmi = math.log((n_ab * float(u_total) * u_total)
                           / (float(bg_total) * uni[a] * uni[b]))
            want[(a, b)] = (n_ab, math.floor(pmi * 10000) / 10000)
        assert got == want

    def test_no_cross_doc_bigrams(self, spark):
        df = spark.createDataFrame([(1, "alpha"), (2, "beta")] * 3,
                                   "doc_id long, text string")
        assert textops.collocations_df(df, min_count=1, k=10).count() == 0

    def test_min_count_and_k(self, spark):
        df = spark.createDataFrame(
            [(i, "x y" if i % 2 else "p q") for i in range(10)],
            "doc_id long, text string")
        rows = textops.collocations_df(df, min_count=5, k=1).collect()
        assert len(rows) == 1 and rows[0]["n_ab"] == 5


class TestSurprisal:
    def test_brute_force_parity(self, spark):
        import math
        from collections import Counter
        docs = [(1, "the the the"), (2, "rare words here"), (3, ""),
                (4, None), (5, "The rare")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: (r["ntok"], r["surprisal"]) for r in
               textops.unigram_surprisal_df(df).collect()}
        freq = Counter()
        per_doc = {}
        for i, t in docs:
            toks = [x.lower() for x in (t or "").split() if x]
            if toks:
                per_doc[i] = toks
                freq.update(toks)
        total = float(sum(freq.values()))
        want = {}
        for i, toks in per_doc.items():
            tf = Counter(toks)
            ssum = 0.0
            for t in sorted(tf):  # ascending-term fold, like the engine
                ssum += float(tf[t]) * -math.log(freq[t] / total)
            want[i] = (len(toks),
                       math.floor(ssum / float(len(toks)) * 10000) / 10000)
        assert got == want
        assert 3 not in got and 4 not in got  # empty docs excluded

    def test_boilerplate_scores_lower(self, spark):
        rows = [(i, "common common common") for i in range(20)]
        rows.append((99, "unique singleton tokens"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["surprisal"] for r in
               textops.unigram_surprisal_df(df).collect()}
        assert out[99] > out[0]

    def test_partition_independence(self, spark):
        rows = [(i, f"tok{i % 7} tok{i % 3} shared") for i in range(50)]
        df1 = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, textops.unigram_surprisal_df(df1).collect()))
        b = sorted(map(tuple, textops.unigram_surprisal_df(
            df1.repartition(13)).collect()))
        assert a == b


class TestCorpusStatsPlanShape:
    def test_collocations_reads_corpus_zero_times_in_final_plan(
            self, spark, tmp_root):
        """The final collocations query must read ONLY the checkpointed
        rollup stats table — zero corpus re-scans. Guards the
        DeduplicateRelations cache-bypass regression: a persisted (not
        checkpointed) cube is silently re-derived from the corpus for
        every self-join reference but one."""
        from fatespark.corpus import pages_pandas
        from fatespark.textops import collocations_df
        src = str(tmp_root / "colloc_plan_src")
        import numpy as np
        (spark.createDataFrame(pages_pandas(np.arange(300))[["text"]])
         .write.mode("overwrite").parquet(src))
        corpus = spark.read.parquet(src)
        plan = (collocations_df(corpus, min_count=2, k=5)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Scan parquet" not in plan, plan[:2000]
        assert plan.count("Scan ExistingRDD") >= 4

    def test_surprisal_scoring_path_never_shuffles(self, spark, tmp_root):
        """Surprisal's r3 plan: the ONLY wide exchange is the vocab-sized
        frequency aggregate; the scoring branch (RLE -> explode ->
        broadcast join -> segmented fold) moves no rows — docs stay on
        their scan partitions all the way into the Arrow fold. Nothing is
        persisted (the r2 shape's in-suite memory-pressure hazard)."""
        import numpy as np

        from fatespark.corpus import pages_pandas
        from fatespark.textops import unigram_surprisal_df
        src = str(tmp_root / "surp_plan_src")
        pdf = pages_pandas(np.arange(300))
        pdf["doc_id"] = np.arange(300, dtype=np.int64)
        (spark.createDataFrame(pdf[["doc_id", "text"]])
         .write.mode("overwrite").parquet(src))
        corpus = spark.read.parquet(src)
        out = unigram_surprisal_df(corpus)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the vocab-sized frequency shuffle ran ONCE inside the eager
        # checkpoint job; the returned plan reads the materialized RDD and
        # moves no rows at all — zero hash exchanges, broadcast-only
        assert plan.count("Exchange hashpartitioning") == 0, plan[:2000]
        assert "BroadcastExchange" in plan
        assert "Scan ExistingRDD" in plan
        assert "InMemoryTableScan" not in plan
        assert "collect_list" not in plan

    def test_surprisal_shuffle_fallback_bit_parity(self, spark, tmp_root):
        """broadcast_vocab=False (the 1e8-vocab web-scale path: shuffle
        join + repartition(doc)+sortWithinPartitions) must produce the
        SAME bits — the fold order is (doc, term) ascending either way."""
        import numpy as np

        from fatespark.corpus import pages_pandas
        from fatespark.textops import unigram_surprisal_df
        src = str(tmp_root / "surp_fb_src")
        pdf = pages_pandas(np.arange(400))
        pdf["doc_id"] = np.arange(400, dtype=np.int64)
        (spark.createDataFrame(pdf[["doc_id", "text"]])
         .write.mode("overwrite").parquet(src))
        corpus = spark.read.parquet(src)
        a = (unigram_surprisal_df(corpus, broadcast_vocab=True)
             .toPandas().sort_values("doc_id").reset_index(drop=True))
        b = (unigram_surprisal_df(corpus, broadcast_vocab=False)
             .toPandas().sort_values("doc_id").reset_index(drop=True))
        assert len(a) == len(b) == 400
        assert (a["ntok"].to_numpy() == b["ntok"].to_numpy()).all()
        assert (a["surprisal"].to_numpy() == b["surprisal"].to_numpy()).all()


class TestSemDeDup:
    """SemDeDup (Abbas et al. 2023): within-cell semantic dedup — engine
    vs a numpy brute reference that re-derives clustering + survivor rule
    from the same deterministic primitives."""

    @pytest.fixture(scope="class")
    def emb60(self, spark):
        rng = np.random.default_rng(23)
        vecs = rng.normal(size=(60, 16))
        vecs[33] = vecs[7] + 0.01 * rng.normal(size=16)   # planted dup
        vecs[50] = vecs[7] + 0.01 * rng.normal(size=16)   # planted dup
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(60)],
            "vec_id long, embedding array<double>")
        return df, vecs

    @staticmethod
    def _brute(df, vecs, threshold, n_centroids=4):
        from fatespark import ann
        cent = ann.ivf_train(df, 16, n_centroids=n_centroids, n_iters=2)
        cid = ann._ivf_nearest(ann._ivf_quant(vecs), cent)
        sims = vecs @ vecs.T
        removed = set()
        for i in range(len(vecs)):
            for j in range(i + 1, len(vecs)):
                if cid[i] == cid[j] and sims[i, j] >= threshold:
                    removed.add(j)
        return cid, removed

    def test_matches_brute_reference(self, emb60):
        df, vecs = emb60
        cid, removed = self._brute(df, vecs, 0.5)
        got = dedup.semdedup(df, threshold=0.5, n_centroids=4,
                             n_iters=2, dim=16, n_blocks=4).collect()
        assert len(got) == 60
        for r in got:
            assert r["ivf_cid"] == cid[r["id"]]
            assert r["keep"] == (r["id"] not in removed)
        # the planted dups of doc 7 land in its cell and are dropped
        assert {33, 50} <= removed

    def test_block_count_invariance(self, emb60):
        df, _ = emb60
        one = {(r["id"], r["keep"]) for r in dedup.semdedup(
            df, 0.5, n_centroids=4, n_iters=2, dim=16, n_blocks=1).collect()}
        five = {(r["id"], r["keep"]) for r in dedup.semdedup(
            df, 0.5, n_centroids=4, n_iters=2, dim=16, n_blocks=5).collect()}
        assert one == five

    def test_plan_has_no_cartesian(self, emb60):
        df, _ = emb60
        from fatespark import ann
        cent = ann.ivf_train(df, 16, n_centroids=4, n_iters=2)
        plan = _physical_plan(dedup.semdedup(
            df, 0.5, n_centroids=4, n_iters=2, dim=16, centroids=cent))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_numpy_kernel_matches_fold(self, emb60):
        """The BLAS tile kernel (the throughput path) and the oracle-exact
        fold kernel agree on every survivor, at two block counts."""
        df, _ = emb60
        from fatespark import ann
        cent = ann.ivf_train(df, 16, n_centroids=4, n_iters=2)
        fold = sorted(map(tuple, dedup.semdedup(
            df, 0.5, n_centroids=4, dim=16, centroids=cent,
            n_blocks=3, kernel="fold").collect()))
        for nb in (1, 3):
            fast = sorted(map(tuple, dedup.semdedup(
                df, 0.5, n_centroids=4, dim=16, centroids=cent,
                n_blocks=nb, kernel="numpy").collect()))
            assert fast == fold

    def test_unknown_kernel_rejected(self, emb60):
        df, _ = emb60
        with pytest.raises(ValueError):
            dedup.semdedup(df, 0.5, dim=16, kernel="simd")


class TestFuzzyDecontam:
    @pytest.fixture(scope="class")
    def sets(self, spark):
        corpus = [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog today ok"),
            (2, "completely different words about spark and parquet io"),
            (3, "benchmark question alpha beta gamma delta epsilon zeta"),
            (4, "unrelated content entirely nothing shared anywhere here"),
        ]
        bench = [
            (100, "the quick brown fox jumps over the lazy dog today"),
            (101, "benchmark question alpha beta gamma delta epsilon zeta"),
        ]
        return (spark.createDataFrame(corpus, "doc_id long, text string"),
                spark.createDataFrame(bench, "doc_id long, text string"))

    def test_flags(self, sets):
        c, b = sets
        got = {r["id"]: r for r in dedup.decontaminate_fuzzy_flags(
            c, b, threshold=0.5).collect()}
        assert got[0]["fuzzy_contaminated"]          # verbatim leak
        assert got[0]["max_jaccard_est"] == 1.0
        assert got[1]["fuzzy_contaminated"]          # light edit
        assert got[3]["fuzzy_contaminated"]          # verbatim leak
        assert not got[2]["fuzzy_contaminated"]
        assert not got[4]["fuzzy_contaminated"]
        assert got[2]["n_bench_matches"] == 0
        assert got[2]["max_jaccard_est"] == 0.0

    def test_bench_side_broadcasts(self, sets):
        c, b = sets
        plan = _physical_plan(dedup.decontaminate_fuzzy_flags(c, b))
        # the candidate join against the benchmark bands must be a
        # broadcast join: the corpus is never shuffled for candidates
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_threshold_monotone(self, sets):
        c, b = sets
        lo = {r["id"] for r in dedup.decontaminate_fuzzy_flags(
            c, b, threshold=0.3).collect() if r["fuzzy_contaminated"]}
        hi = {r["id"] for r in dedup.decontaminate_fuzzy_flags(
            c, b, threshold=0.9).collect() if r["fuzzy_contaminated"]}
        assert hi <= lo
