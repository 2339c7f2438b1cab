"""Federated dfs_query_then_fetch search (fatespark.federate): two
shard indexes under global stats must reproduce the union index's
ranking bit-for-bit; query_then_fetch (local stats) must NOT."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_pandas
from fatespark.federate import federated_stats, search_federated
from fatespark.query import SearchIndex


@pytest.fixture(scope="module")
def shards(spark, tmp_root):
    """Union corpus split by doc_id parity into two UNEQUAL shards
    (uneven doc counts and vocab skew), plus the union index."""
    pdf = pages_pandas(np.arange(300))
    df = (spark.createDataFrame(pdf[["url", "text"]])
          .withColumn("doc_id", F.xxhash64("url"))
          .select("doc_id", "text").persist())
    a = df.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 0)
    b = df.filter(F.pmod(F.col("doc_id"), F.lit(3)) != 0)
    out = []
    for name, part, nb in (("a", a, 2), ("b", b, 4), ("u", df, 3)):
        d = str(tmp_root / f"fed_{name}")
        IndexBuilder(d, BuildConfig(n_buckets=nb, salt_bits=0)).build(
            spark, part, id_col="doc_id", url_col="doc_id",
            text_col="text", build_id=f"fed-{name}")
        out.append(SearchIndex(spark, d))
    return out  # (shard_a, shard_b, union)


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


class TestFederated:
    @pytest.mark.parametrize("mode,q", [
        ("OR", ["smith", "jones"]),
        ("AND", ["smith", "jones"]),
        ("OR", ["the"]),
    ])
    def test_bit_identical_to_union_index(self, shards, mode, q):
        a, b, u = shards
        fed = _rows(search_federated([a, b], q, k=10, mode=mode))
        one = _rows(u.search(q, k=10, mode=mode))
        assert fed == one and fed

    def test_quantized_and_wand_paths(self, shards):
        a, b, u = shards
        q = ["smith", "jones"]
        fed = _rows(search_federated([a, b], q, k=10, mode="OR",
                                     quantize=4))
        one = _rows(u.search(q, k=10, mode="OR", quantize=4))
        assert fed == one
        fedw = _rows(search_federated([a, b], q, k=10, mode="OR",
                                      quantize=4, use_wand=True))
        assert fedw == one  # WAND bounds stay valid under global stats

    def test_local_stats_would_differ(self, shards):
        """The defect dfs_query_then_fetch exists to fix: per-shard idfs
        differ from global (the shards are vocab-skewed), so at least
        one doc's locally-scored value differs from its federated
        score."""
        a, b, u = shards
        q = ["smith"]
        fed = dict(_rows(search_federated([a, b], q, k=300, mode="OR")))
        local = dict(_rows(a.search(q, k=300, mode="OR"))
                     + _rows(b.search(q, k=300, mode="OR")))
        assert set(local) == set(fed)
        assert any(local[d] != fed[d] for d in fed)

    def test_dfs_stats_sum(self, shards):
        a, b, u = shards
        n, favg, gdf = federated_stats([a, b], ["smith"])
        assert n == u.n_docs
        ust = u.term_stats(["smith"])
        for (t, f), d in gdf.items():
            assert d == ust[t][f]["df"]
        assert favg[0] == pytest.approx(u.field_avgdl[0], rel=1e-12)

    def test_and_skips_shard_missing_a_term(self, shards, spark,
                                            tmp_root):
        """A shard whose dictionary lacks a query term contributes no
        AND candidates — and the merged result still matches the union
        index (whose kernel drops those docs doc-wise)."""
        a, b, u = shards
        # every 'zzzonly' doc lives in shard b: craft via a term filter
        q = ["smith", "jones", "taylor"]
        fed = _rows(search_federated([a, b], q, k=10, mode="AND"))
        one = _rows(u.search(q, k=10, mode="AND"))
        assert fed == one

    def test_validation(self, shards):
        a, b, u = shards
        with pytest.raises(ValueError):
            search_federated([], ["x"])
        with pytest.raises(ValueError):
            search_federated([a, b], ["smith"], k=0)
        with pytest.raises(ValueError):
            search_federated([a, b], [])
