"""Snapshot commits + time travel over the index-directory seam
(fatespark.snapshots): every publish/delete/vacuum is a retained, immutable
snapshot; readers pin one by id or timestamp; expire reclaims archives.
The Iceberg commit model the build docstring promises, demonstrated."""

import pytest

from fatespark import snapshots as snap
from fatespark.build import BuildConfig, IndexBuilder
from fatespark.corpus import pages_df
from fatespark.query import SearchIndex


@pytest.fixture()
def built(spark, tmp_path):
    d = str(tmp_path / "snap_idx")
    b = IndexBuilder(d, BuildConfig(n_buckets=4, salt_bits=1))
    b.build(spark, pages_df(spark, 1500, partitions=4), build_id="s1")
    return b, d


def _top(idx, terms, k=10, mode="OR"):
    return [r["doc_id"] for r in idx.search(terms, k=k, mode=mode).collect()]


def test_build_commits_snapshot(spark, built):
    _, d = built
    h = snap.history(d)
    assert list(h["operation"]) == ["build"]
    assert snap.current_id(d) == 1
    idx = SearchIndex(spark, d, snapshot_id=1)
    assert idx.snapshot_id == 1
    assert _top(idx, ["the", "smith"]) == _top(SearchIndex(spark, d),
                                               ["the", "smith"])


def test_delete_commit_and_travel_back(spark, built):
    b, d = built
    before = _top(SearchIndex(spark, d), ["the", "smith"], mode="AND")
    b.delete_docs(spark, before[:3])
    assert list(snap.history(d)["operation"]) == ["build", "delete"]

    cur = SearchIndex(spark, d)  # current: deletes applied
    assert not set(before[:3]) & set(_top(cur, ["the", "smith"], mode="AND"))
    old = SearchIndex(spark, d, snapshot_id=1)  # pre-delete: un-deleted
    assert old.tombstones is None
    assert _top(old, ["the", "smith"], mode="AND") == before


def test_vacuum_keeps_prevacuum_snapshot_readable(spark, built):
    b, d = built
    idx0 = SearchIndex(spark, d)
    victims = _top(idx0, ["the"], k=4)
    before = _top(idx0, ["smith", "jones"], k=15)
    n0 = idx0.n_docs
    b.delete_docs(spark, victims)
    b.vacuum(spark)
    ops = list(snap.history(d)["operation"])
    assert ops == ["build", "delete", "vacuum"]

    cur = SearchIndex(spark, d)
    assert cur.n_docs == n0 - len(victims)
    # snapshot 1: full pre-delete corpus, original stats and results
    old = SearchIndex(spark, d, snapshot_id=1)
    assert old.n_docs == n0
    assert _top(old, ["smith", "jones"], k=15) == before
    # snapshot 2: tombstoned view (same postings, victims masked)
    tomb = SearchIndex(spark, d, snapshot_id=2)
    assert tomb.n_docs == n0  # stats stale by design pre-vacuum
    assert sorted(tomb.tombstones) == sorted(victims)
    assert not set(victims) & set(_top(tomb, ["the"], k=10))


def test_as_of_timestamp_resolution(spark, built):
    b, d = built
    log = snap.read_log(d)
    t_build = float(log["ts"].iloc[0])
    b.delete_docs(spark, _top(SearchIndex(spark, d), ["the"], k=2))
    assert SearchIndex(spark, d, as_of=t_build).snapshot_id == 1
    assert SearchIndex(spark, d, as_of=t_build + 1e9).snapshot_id == 2
    with pytest.raises(KeyError):
        snap.resolve(d, as_of=t_build - 10.0)


def test_rebuild_archives_prior_chunks(spark, built):
    b, d = built
    first = _top(SearchIndex(spark, d), ["the", "smith"])
    # rebuild the same dir from a different corpus: same chunk ids would
    # clobber snapshot 1's data without the archive step
    b.build(spark, pages_df(spark, 900, partitions=2, seed=7),
            build_id="s2")
    assert snap.current_id(d) == 2
    idx1 = SearchIndex(spark, d, snapshot_id=1)
    assert idx1.n_docs == 1500
    assert _top(idx1, ["the", "smith"]) == first
    assert SearchIndex(spark, d).n_docs == 900


def test_local_reader_time_travel_parity(spark, built):
    from fatespark.local import LocalSearchIndex
    b, d = built
    victims = _top(SearchIndex(spark, d), ["the"], k=3)
    b.delete_docs(spark, victims)
    b.vacuum(spark)
    for sid in (1, 2, 3):
        dist = SearchIndex(spark, d, snapshot_id=sid)
        loc = LocalSearchIndex(d, snapshot_id=sid)
        assert loc.snapshot_id == sid
        assert loc.n_docs == dist.n_docs
        got = loc.search(["the", "smith"], k=10, mode="OR",
                         with_url=True)
        exp = dist.search(["the", "smith"], k=10, mode="OR",
                          with_url=True).toPandas()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        assert got["score"].tolist() == exp["score"].tolist()
        assert got["url"].tolist() == exp["url"].tolist()


def test_streaming_epochs_are_snapshots(spark, tmp_path):
    """finalize_every=1 publishes one snapshot per micro-batch epoch —
    time travel steps back through stream progress."""
    from fatespark.streaming import StreamingIndexer
    d = str(tmp_path / "stream_snap_idx")
    b = IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0))
    si = StreamingIndexer(b, build_id="ep", finalize_every=1)
    corpus = pages_df(spark, 800, partitions=2)
    from pyspark.sql import functions as F
    half = F.pmod(F.xxhash64(F.col("url")), 2)  # == doc_id parity
    si.process_batch(corpus.filter(half == 0), 0)
    si.process_batch(corpus.filter(half == 1), 1)
    h = snap.history(d)
    assert len(h) == 2 and set(h["operation"]) == {"build"}
    e1 = SearchIndex(spark, d, snapshot_id=1)
    e2 = SearchIndex(spark, d, snapshot_id=2)
    assert e2.n_docs == 800 and 0 < e1.n_docs < 800
    # epoch-1 snapshot only knows even-parity docs (doc_id = xxhash64(url))
    assert all(i % 2 == 0 for i in _top(e1, ["the", "smith"]))


def test_incremental_build_after_vacuum(spark, built):
    """Vacuum consolidates into the reserved chunk=-1, so later incremental
    chunks (streaming epochs >= 0) append cleanly: uniform partitioned
    layout, no collision with the consolidated segment."""
    from fatespark.streaming import StreamingIndexer
    b, d = built
    idx0 = SearchIndex(spark, d)
    victims = _top(idx0, ["the"], k=3)
    n0 = idx0.n_docs
    b.delete_docs(spark, victims)
    b.vacuum(spark)

    extra = pages_df(spark, 400, partitions=2, seed=11)
    si = StreamingIndexer(b, build_id="post-vac", finalize_every=1)
    si.process_batch(extra, 0)

    idx = SearchIndex(spark, d)
    assert idx.n_docs == n0 - len(victims) + 400
    assert not set(victims) & set(_top(idx, ["the"], k=20))
    ops = list(snap.history(d)["operation"])
    assert ops == ["build", "delete", "vacuum", "build"]
    # consolidated segment still reachable pre-append
    assert SearchIndex(spark, d, snapshot_id=3).n_docs == n0 - len(victims)


def test_expire_reclaims_and_invalidates(spark, built):
    b, d = built
    b.delete_docs(spark, _top(SearchIndex(spark, d), ["the"], k=2))
    b.vacuum(spark)
    got = snap.expire(d, keep_last=1)
    assert got["expired"] == 2 and got["freed_dirs"] >= 1
    # current still reads; expired snapshots now fail loudly
    assert SearchIndex(spark, d).n_docs > 0
    with pytest.raises((KeyError, FileNotFoundError)):
        SearchIndex(spark, d, snapshot_id=1)
    # live current snapshot still resolvable by id
    sid = snap.current_id(d)
    assert SearchIndex(spark, d, snapshot_id=sid).snapshot_id == sid


class TestRestore:
    def test_restore_undoes_delete(self, spark, built):
        b, d = built
        before = _top(SearchIndex(spark, d), ["the", "smith"], mode="AND")
        b.delete_docs(spark, before[:3])
        assert set(before[:3]) & set(before)
        sid = snap.restore(d, 1)
        assert sid == 3
        ops = list(snap.history(d)["operation"])
        assert ops == ["build", "delete", "restore"]
        cur = SearchIndex(spark, d)       # NEW current == snapshot 1
        assert cur.tombstones is None
        assert _top(cur, ["the", "smith"], mode="AND") == before
        # the abandoned head stays time-travelable
        deleted = SearchIndex(spark, d, snapshot_id=2)
        assert not set(before[:3]) & set(
            _top(deleted, ["the", "smith"], mode="AND"))

    def test_restore_after_vacuum_relinks_archived_tables(self, spark,
                                                          built):
        b, d = built
        idx0 = SearchIndex(spark, d)
        before = _top(idx0, ["smith", "jones"], k=15)
        n0 = idx0.n_docs
        b.delete_docs(spark, before[:2])
        b.vacuum(spark)                    # physically rewrites the index
        assert SearchIndex(spark, d).n_docs == n0 - 2
        snap.restore(d, 1)                 # pre-delete layout is archived
        cur = SearchIndex(spark, d)
        assert cur.n_docs == n0
        assert _top(cur, ["smith", "jones"], k=15) == before
        # later WRITERS see the restored layout: a fresh delete works on
        # the restored corpus (live_tables == restored tables)
        b.delete_docs(spark, before[:1])
        assert not set(before[:1]) & set(
            _top(SearchIndex(spark, d), ["smith", "jones"], k=15))

    def test_restore_survives_expire(self, spark, built):
        b, d = built
        idx0 = SearchIndex(spark, d)
        before = _top(idx0, ["the"], k=10)
        b.delete_docs(spark, before[:2])
        b.vacuum(spark)
        snap.restore(d, 1)
        snap.expire(d, keep_last=1)        # drops every older snapshot
        cur = SearchIndex(spark, d)        # hard links keep data alive
        assert _top(cur, ["the"], k=10) == before

    def test_unknown_snapshot_raises(self, built):
        _, d = built
        with pytest.raises(ValueError):
            snap.restore(d, 99)
