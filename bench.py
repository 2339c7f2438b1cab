#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
   "sf": ..., "build_docs_per_sec": ..., ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     FATESPARK_BENCH_PAGES (default 200000 synthetic ~109-token pages; the
     reference's published run is 50k two-word name records, BASELINE.md —
     tokens/doc is reported so the comparison stays honest),
     FATESPARK_BENCH_SCALE_PAGES (default 2000000: the once-per-round
     linear-scaling probe of the heavy ops; 0 disables),
     FATESPARK_BENCH_PROBE (default 1: gate the run on a healthy host
     window — bench/hostprobe.py must show 16c/4c per-core >= 0.9, with
     bounded retries — so the artifact of record is not a throttle
     artifact; the probe result is embedded in the output),
     FATESPARK_BENCH_BUDGET (default 1500 s: wall budget after which the
     2M scale probes are skipped and recorded as skipped — no silent cap).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def _hostprobe_gate(retries: int, wait: float) -> dict:
    """BENCH.md protocol: pinned per-core throughput at 4 vs 16 cores;
    a ratio < 0.9 means the hypervisor is throttling sustained multi-core
    load and every wall-clock number in that window is corrupt."""
    import importlib.util
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench", "hostprobe.py")
    spec = importlib.util.spec_from_file_location("hostprobe", p)
    hp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(hp)
    info: dict = {}
    for attempt in range(retries + 1):
        u4 = hp.probe(4, 2.0)
        u16 = hp.probe(16, 2.0)
        m4 = hp.probe(4, 2.0, hp._stream)
        m16 = hp.probe(16, 2.0, hp._stream)
        ratio = u16 / u4
        mratio = m16 / m4
        # the CPU axis gates the suite (most entries are latency/compute
        # shaped); the MEM axis is recorded so a bandwidth-degraded window
        # (hostprobe.py module docstring) is visible in the artifact and
        # build_pages numbers from such a window can be discounted
        info = {"probe_ratio_16_over_4": round(ratio, 3),
                "probe_mem_ratio_16_over_4": round(mratio, 3),
                "probe_attempt": attempt,
                "probe_healthy": ratio >= 0.90}
        if info["probe_healthy"]:
            break
        if attempt < retries:
            time.sleep(wait)
    return info


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("FATESPARK_BENCH_PAGES", "200000"))
    scale_pages = int(os.environ.get("FATESPARK_BENCH_SCALE_PAGES",
                                     "2000000"))
    budget = float(os.environ.get("FATESPARK_BENCH_BUDGET", "1500"))
    t_suite0 = time.time()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from fatespark.build import BuildConfig, IndexBuilder
    from fatespark.corpus import pages_df
    from fatespark.query import SearchIndex
    from fatespark.session import get_spark
    from fatespark import ann, dedup

    from fatespark.session import warm_python_workers

    times: dict[str, float] = {}
    extra: dict = {}

    # -- host-probe gate: refuse to record inside a throttled window --------
    if os.environ.get("FATESPARK_BENCH_PROBE", "1") != "0":
        extra.update(_hostprobe_gate(
            retries=int(os.environ.get("FATESPARK_BENCH_PROBE_RETRIES",
                                       "5")),
            wait=float(os.environ.get("FATESPARK_BENCH_PROBE_WAIT", "30"))))

    spark = get_spark(cpus=cpus, app="fatespark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cpus)
    warmup_pages = int(os.environ.get("FATESPARK_BENCH_WARMUP_PAGES", "20000"))

    # drop persisted one-pass stats tables / localCheckpoint blocks between
    # heavy samples so each measurement is clean-room; the driver
    # System.gc() lets the ContextCleaner reap shuffle files + checkpoint
    # blocks clearCache misses (they pin /dev/shm + unified memory)
    def clean_room():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def timed(name, reps: int = 1, pre=None, record_samples: bool = True):
        """Time fn; with reps > 1 report the median of reps runs. ``pre``
        runs untimed before EVERY sample (clean_room / rmtree for builds
        so re-runs do full work). Raw run-order samples are recorded for
        EVERY multi-rep entry (the BENCH.md 3-sample protocol, round-5
        extended from the >5 s family to everything sampled — a single
        1.5 s sample against a 1.2 s steady state misreports by 25%)."""
        def deco(fn):
            samples = []
            out = None
            for _ in range(reps):
                if pre is not None:
                    pre()
                t0 = time.time()
                out = fn()
                samples.append(round(time.time() - t0, 4))
            times[name] = sorted(samples)[len(samples) // 2]
            if record_samples and reps > 1:
                extra[f"{name}_samples"] = samples
            return out
        return deco

    # -- index build over synthetic Common-Crawl-style pages ----------------
    # corpus materialized to parquet once so the build measures the real
    # pipeline (parquet scan -> tokenize -> merge -> write), not generation
    idx_dir = "/tmp/fatespark_bench_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)
    corpus_path = f"/tmp/fatespark_bench_corpus_{n_pages}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        pages_df(spark, n_pages, partitions=cpus * 2).write.mode(
            "overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # untimed warmup build (JIT, python-worker numpy import + arena growth,
    # parquet readers): the suite measures steady-state throughput, the same
    # protocol as bench/scaling.py. First-touch page faults on a cold VM
    # otherwise dominate the first build (measured 2x on this sandbox).
    if warmup_pages > 0:
        wdir = "/tmp/fatespark_bench_warmup_idx"
        shutil.rmtree(wdir, ignore_errors=True)
        IndexBuilder(wdir, BuildConfig(n_buckets=8, salt_bits=1,
                                       block_size=128)).build(
            spark, corpus.limit(warmup_pages), build_id="warmup")
        shutil.rmtree(wdir, ignore_errors=True)

    def _fresh_build_dir():
        shutil.rmtree(idx_dir, ignore_errors=True)
        clean_room()

    @timed("build_pages", reps=3, pre=_fresh_build_dir, record_samples=True)
    def _build():
        return IndexBuilder(idx_dir, BuildConfig(
            n_buckets=8, salt_bits=1, block_size=128)).build(
            spark, corpus, build_id="bench")
    totals = _build
    extra["build_docs"] = n_pages
    extra["build_docs_per_sec"] = round(n_pages / times["build_pages"], 1)
    extra["build_postings"] = totals["postings"]
    extra["build_postings_per_sec"] = round(
        totals["postings"] / times["build_pages"], 1)
    if totals.get("sum_dl"):
        extra["build_tokens"] = totals["sum_dl"]
        extra["tokens_per_doc"] = round(totals["sum_dl"] / n_pages, 1)
        extra["build_tokens_per_sec"] = round(
            totals["sum_dl"] / times["build_pages"], 1)

    idx = SearchIndex(spark, idx_dir)

    # persisted SymSpell banded dictionary: one vocab-sized build, after
    # which every served term~N query probes (directory + row-group
    # pruning) instead of re-expanding the dictionary inline
    from fatespark.suggest import write_fuzzy_variants

    @timed("fuzzy_variants_build", reps=3, pre=clean_room,
           record_samples=True)
    def _fvb():
        return write_fuzzy_variants(idx, depth=2)

    # -- static index pruning (Carmel 2001): the serving-tier twin ----------
    from fatespark.pruning import prune_index
    pr_dir = "/tmp/fatespark_bench_idx_pruned"

    def _fresh_prune_dir():
        shutil.rmtree(pr_dir, ignore_errors=True)
        clean_room()

    @timed("prune_build", reps=3, pre=_fresh_prune_dir, record_samples=True)
    def _prb():
        return prune_index(spark, idx, pr_dir, k_prune=10, eps=0.75)
    pruned_idx = _prb
    extra["prune_kept_postings"] = int(
        pruned_idx.postings.agg({"n": "sum"}).collect()[0][0])
    extra["prune_kept_frac"] = round(
        extra["prune_kept_postings"] / max(totals["postings"], 1), 4)

    @timed("q_or3_pruned", reps=3)
    def _wpq():  # the q_or3_wand A/B over the pruned serving index
        return pruned_idx.search(["the", "smith", "zyzzyva"], k=10,
                                 mode="OR", use_wand=True).collect()

    # -- impact-ordered quantized index (Anh & Moffat 2006) -----------------
    from fatespark.impact import ImpactIndex, build_impact_index
    imp_dir = "/tmp/fatespark_bench_idx_impact"

    def _fresh_impact_dir():
        shutil.rmtree(imp_dir, ignore_errors=True)
        clean_room()

    @timed("impact_build", reps=3, pre=_fresh_impact_dir,
           record_samples=True)
    def _imb():
        build_impact_index(spark, idx, imp_dir, bits=8)
        return ImpactIndex(spark, imp_dir)
    impact_idx = _imb

    @timed("q_or3_impact", reps=3)
    def _imq():  # integer-summed A/B of q_or3_wand; qmin=1 scan cutoff
        return impact_idx.search(["the", "smith", "zyzzyva"], k=10,
                                 qmin=1).collect()

    # -- reference-style query set (head/mid/tail, AND/OR/WAND/prefix/phrase)
    @timed("q_count_head", reps=3)
    def _c():
        return idx.count("the")

    @timed("q_and2", reps=3)
    def _a():
        return idx.search(["smith", "the"], k=10, mode="AND").collect()

    @timed("q_or2", reps=3)
    def _o():
        return idx.search(["smith", "jones"], k=10, mode="OR").collect()

    @timed("q_or3_wand", reps=3)
    def _w():
        return idx.search(["the", "smith", "zyzzyva"], k=10, mode="OR",
                          use_wand=True).collect()

    @timed("q_or3_exh", reps=3)
    def _we():  # same query, exhaustive kernel — the WAND A/B
        return idx.search(["the", "smith", "zyzzyva"], k=10, mode="OR",
                          use_wand=False).collect()

    @timed("q_or3_maxscore", reps=3)
    def _wm():  # same query, MaxScore pruner — the third arm of the A/B
        return idx.search(["the", "smith", "zyzzyva"], k=10, mode="OR",
                          use_wand="maxscore").collect()

    @timed("q_prefix", reps=3)
    def _p():
        return idx.search_prefix("fa", k=10).collect()

    @timed("q_phrase", reps=3)
    def _ph():
        return idx.search_phrase("big array", k=10).collect()

    @timed("q_phrase_prefix", reps=3)
    def _pp():
        return idx.search_phrase_prefix("big arr", k=10).collect()

    @timed("q_near", reps=3)
    def _nr():  # proximity: same tokens as q_phrase, unordered 4-window
        return idx.search_near(["big", "array"], slop=4, k=10).collect()

    @timed("q_span_first", reps=3)
    def _spf():  # SpanFirst: phrase must end in the first 40 tokens
        return idx.search_span_first("big array", 40, k=10).collect()

    @timed("q_span_not", reps=3)
    def _spn():  # SpanNot: phrase spans with no 'scan' within 3 tokens
        return idx.search_span_not("big array", "scan", pre=3, post=3,
                                   k=10).collect()

    @timed("q_span_within", reps=3)
    def _spw():  # SpanWithin: 'array' spans enclosed in a 'big array' span
        return idx.search_span_within("array", "big array", k=10).collect()

    @timed("q_span_containing", reps=3)
    def _spc():  # SpanContaining: big-side SpanOr, only one clause can hold
        return idx.search_span_containing(["big array", "merge scan"],
                                          "array", k=10).collect()

    @timed("q_batch3", reps=3)
    def _qb():  # 3 queries, one postings scan (vs 3x the single-query cost)
        return idx.search_many(
            {"a": ["smith", "jones"], "b": ["the"], "c": ["big", "array"]},
            k=10, mode="OR").collect()

    # -- round-2 query features over the same index --------------------------
    from fatespark.suggest import suggest as _suggest
    from fatespark.wildcard import search_wildcard as _swc
    from fatespark.mlt import more_like_this as _mlt
    from fatespark.rescore import collapsed_topk as _ct, recency_topk as _rt

    @timed("q_suggest", reps=3)
    def _sg():  # SymSpell banding over the full dictionary, 2 query terms
        return _suggest(idx, ["smiht", "jnoes"], k=5, max_edit=2).collect()

    @timed("q_wildcard", reps=3)
    def _wc():  # trigram-banded infix over the dictionary + OR scoring
        return _swc(idx, "*mit*", k=10).collect()

    from fatespark.querylang import execute as _qx

    @timed("q_fuzzy", reps=3)
    def _fz():  # two typos -> distance-1 probe of the persisted bands
        return _qx(idx, "smiht~1 jnoes~1", k=10, mode="OR").collect()

    @timed("q_fuzzy2", reps=3)
    def _fz2():  # complete distance-2 expansion — the vocabulary-bound
        # case pre-persistence (r2: recomputed ~L^2/2 variants per query)
        return _qx(idx, "smiht~2 jnoes~2", k=10, mode="OR").collect()

    mlt_corpus = corpus.withColumn("doc_id", F.xxhash64("url"))
    mlt_seed = int(idx.docs.select("doc_id").first()["doc_id"])

    @timed("q_prox_boost", reps=3)
    def _pxb():  # min-span proximity re-rank over the AND match set
        return idx.search_proximity_boost(["smith", "the"], k=10,
                                          c=1.0).collect()

    @timed("q_sort_by_field", reps=3)
    def _sbf():  # match set ordered by stored field, k-bounded top-k
        from fatespark.query import search_sorted_by
        c = mlt_corpus.withColumn("n_chars", F.length("text"))
        return search_sorted_by(idx, c, ["smith", "jones"], "n_chars",
                                k=10, mode="OR", ascending=False).collect()

    @timed("q_mmr", reps=3)
    def _mmr():  # MMR diversified top-10 over a 20-doc pool + embeddings
        from fatespark.mmr import mmr_rerank
        emb = mlt_corpus.select(
            F.col("doc_id").alias("vec_id"),
            F.array(*[(F.pmod(F.xxhash64(F.col("doc_id") + F.lit(i)),
                              F.lit(1000)) / 1000.0 - 0.5).cast("float")
                      for i in range(16)]).alias("embedding"))
        return mmr_rerank(idx, emb, ["smith", "jones"], k=10, pool=20,
                          lam=0.7).collect()

    @timed("q_common_terms", reps=3)
    def _cts():  # head term required-free, rare term defines candidates
        from fatespark.commonterms import common_terms_search
        return common_terms_search(idx, ["the", "smith", "jones"], k=10,
                                   max_doc_freq=0.5).collect()

    @timed("q_prf", reps=3)
    def _prf():  # Bo1 pseudo-relevance feedback: two searches + k-doc stats
        from fatespark.prf import prf_search
        return prf_search(idx, mlt_corpus, ["smith", "jones"], k=10,
                          fb_docs=10, fb_terms=8, beta=0.4).collect()

    @timed("q_mlt", reps=3)
    def _ml():  # seed fetch + df lookup + ordinary OR search
        return _mlt(idx, mlt_corpus, mlt_seed, k=10, m=4).collect()

    meta_ts = corpus.select(
        F.xxhash64("url").alias("doc_id"),
        F.col("warc_ts").cast("long").alias("ts"))

    @timed("q_recency", reps=3)
    def _rc():  # rescoring window: broadcast 100-row candidate join
        return _rt(idx, meta_ts, ["smith", "jones"], half_life_days=30.0,
                   now_ts=1_700_000_000, ts_col="ts", k=10,
                   pool=100).collect()

    meta_lang = corpus.select(F.xxhash64("url").alias("doc_id"), "lang")

    @timed("q_collapse", reps=3)
    def _cg():  # diversity cap per lang within the top-100 window
        return _ct(idx, meta_lang, ["smith", "jones"], group_col="lang",
                   per_group=3, k=10, pool=100).collect()

    # variance-free size metrics (host contention moves seconds, not bytes)
    import glob as _glob
    post_bytes = sum(os.path.getsize(f) for f in _glob.glob(
        os.path.join(idx_dir, "postings", "**", "*.parquet"), recursive=True))
    extra["index_postings_bytes"] = post_bytes
    extra["index_bytes_per_posting"] = round(
        post_bytes / max(1, totals["postings"]), 3)

    # -- driver-local read path (pyarrow + same kernels, no Spark jobs) -----
    from fatespark.build import IndexBuilder as _IB
    from fatespark.local import LocalSearchIndex

    @timed("compact_local", reps=3)
    def _cl():
        return _IB(idx_dir, BuildConfig(n_buckets=8, salt_bits=1)
                   ).compact_local(spark)
    lidx = LocalSearchIndex(idx_dir)
    lidx.search(["smith"], k=10, mode="OR")  # warm footers/skip index

    @timed("ql_count_head", reps=3)
    def _lc():
        return lidx.count("the")

    @timed("ql_and2", reps=3)
    def _la():
        return lidx.search(["smith", "the"], k=10, mode="AND")

    @timed("ql_or2", reps=3)
    def _lo():
        return lidx.search(["smith", "jones"], k=10, mode="OR")

    @timed("ql_prefix", reps=3)
    def _lp():
        return lidx.search_prefix("fa", k=10)

    @timed("ql_phrase", reps=3)
    def _lph():
        return lidx.search_phrase("big array", k=10)

    @timed("ql_fuzzy2", reps=3)
    def _lfz2():  # local distance-2 fuzzy via the persisted bands: reads
        # only the row groups covering the query's own deletion variants
        return _qx(lidx, "smiht~2 jnoes~2", k=10, mode="OR")

    # -- training-data ops over the driver tables ---------------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    @timed("dd_minhash", reps=3)
    def _mh():
        return dedup.minhash_dedup_pairs(docs, threshold=0.35,
                                         num_hashes=64, bands=16).count()

    from fatespark import textops as _textops

    # 3 recorded samples (not median-only): r2 observed 7.8-52 s run-to-run
    # host variance here; the samples show whether the min_count pre-filter
    # on the checkpointed rollup holds consecutive runs within 2x
    colloc_samples = []
    for _ in range(3):
        t0 = time.time()
        _textops.collocations_df(corpus, min_count=50, k=20).collect()
        colloc_samples.append(round(time.time() - t0, 4))
        spark.catalog.clearCache()
    times["tx_colloc_200k"] = sorted(colloc_samples)[1]
    extra["tx_colloc_samples"] = colloc_samples

    clean_room()

    # same 3-sample protocol as colloc: this entry sits where the host's
    # throttle windows land (observed 9-125 s for an identical plan across
    # sessions); the samples expose the variance, the median is the signal
    su_samples = []
    for _ in range(3):
        t0 = time.time()
        _textops.unigram_surprisal_df(
            corpus.select(F.xxhash64("url").alias("doc_id"), "text")).count()
        su_samples.append(round(time.time() - t0, 4))
        clean_room()
    times["tx_surprisal_200k"] = sorted(su_samples)[1]
    extra["tx_surprisal_samples"] = su_samples

    # char-granular substring index (suffix-array parity surface): build
    # over 20k pages (corpus-char-scale rows — same asymptotics as the
    # suffix array it replaces), probe must prune to one kbucket dir
    from fatespark import charindex as _ci

    # deterministic 1-in-20 slice, NOT limit(): GlobalLimit collapses to
    # one task and single-threads the whole narrow derivation feeding the
    # index shuffle (measured 27 s vs 7 s for the identical row count)
    ci_docs = (corpus.filter(F.pmod(F.xxhash64("url"), F.lit(20)) == 0)
               .select(F.xxhash64("url").alias("doc_id"), "text"))

    @timed("charindex_build_10k", reps=3, pre=clean_room,
           record_samples=True)
    def _cib():
        return _ci.CharIndex.build(
            ci_docs, "/tmp/fatespark_bench_charidx", k=8, n_buckets=64)

    @timed("charindex_probe_10k", reps=3)
    def _cip():
        idx = _ci.CharIndex("/tmp/fatespark_bench_charidx")
        return idx.find(spark, ci_docs, "he smith ").count()

    clean_room()

    @timed("tx_bigram_surprisal_200k", reps=3, pre=clean_room, record_samples=True)
    def _bsu():  # conditional bigram-LM surprisal (shuffle-join path)
        return _textops.bigram_surprisal_df(
            corpus.select(F.xxhash64("url").alias("doc_id"),
                          "text")).count()

    clean_room()

    @timed("tx_quality_tiers_200k", reps=3, pre=clean_room, record_samples=True)
    def _qt():  # CCNet head/middle/tail tiers on top of the surprisal plan
        return (_textops.quality_tiers_df(
            corpus.select(F.xxhash64("url").alias("doc_id"), "text"))
            .groupBy("tier").count().collect())

    clean_room()

    @timed("tx_dsir_200k", reps=3, pre=clean_room, record_samples=True)
    def _ds():  # DSIR importance weights toward the en slice, m=4096
        from fatespark import dsir as _dsir
        return (_dsir.dsir_logweights(
            corpus.select(F.xxhash64("url").alias("doc_id"), "lang",
                          "text"),
            F.col("lang") == "en", m=4096)
            .agg(F.sum("logw"), F.count("*")).collect())

    clean_room()

    # Bloom seen-set: build over all 200k urls (m sized for ~0.1% fp),
    # checkpoint the word table, then probe a 50/50 present/absent batch
    from fatespark.sketch import bloom_build, bloom_probe
    _bloom_m, _bloom_k = 1 << 22, 4
    _bloom_holder = {}

    @timed("dd_bloom_build_200k", reps=3)
    def _bb():
        b = bloom_build(corpus.select("url"), "url",
                        m_bits=_bloom_m, k=_bloom_k)
        _bloom_holder["b"] = b.localCheckpoint(eager=True)
        return _bloom_holder["b"]

    @timed("tx_cms_build_200k", reps=3, pre=clean_room, record_samples=True)
    def _cms():  # count-min term-frequency sketch over all corpus tokens
        from fatespark.sketch import cms_build
        terms = corpus.select(F.explode(F.split(
            F.trim(F.coalesce(F.col("text"), F.lit(""))),
            r"\s+")).alias("term"))
        return cms_build(terms, "term", depth=4,
                         width=1 << 14).count()

    @timed("dd_bloom_probe_100k", reps=3)
    def _bp():
        half = corpus.select("url").limit(50000)
        absent = corpus.select(
            F.concat(F.lit("https://never-crawled/"), F.col("url"))
            .alias("url")).limit(50000)
        return bloom_probe(_bloom_holder["b"], half.unionByName(absent),
                           "url", m_bits=_bloom_m, k=_bloom_k) \
            .agg(F.sum(F.col("member").cast("long"))).collect()

    clean_room()

    @timed("tx_kmv_200k", reps=3)
    def _kmv():  # KMV distinct-url sketch per lang over the 200k pages
        from fatespark.sketch import kmv_distinct_df
        return kmv_distinct_df(corpus, "lang", "url", k=256).collect()

    @timed("tx_hll_200k", reps=3, pre=clean_room, record_samples=True)
    def _hll():  # HyperLogLog distinct token bigrams per lang (p=12)
        from fatespark.sketch import hll_distinct_df
        toks = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
        pairs = (corpus.select("lang", toks.alias("toks"))
                 .filter(F.size("toks") >= 2)
                 .select("lang", F.explode(F.expr(
                     "transform(sequence(1, size(toks) - 1), "
                     "i -> concat(toks[i - 1], ' ', toks[i]))"))
                     .alias("bigram")))
        return hll_distinct_df(pairs, "lang", "bigram", p=12).collect()

    @timed("tx_boiler_200k", reps=3, pre=clean_room, record_samples=True)
    def _boil():  # jusText paragraph verdicts + main text, zero-shuffle scan
        from fatespark import boiler
        html_str = F.concat(
            F.lit('<html><body><div><a href="/a">home</a> '
                  '<a href="/b">about</a> <a href="/c">contact</a></div><p>'),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit('</p><ul><li><a href="/m">more stories</a></li></ul>'
                  '<div>fin 2024</div></body></html>'))
        pages = corpus.select(
            F.xxhash64("url").alias("doc_id"),
            F.encode(html_str, "UTF-8").alias("html"))
        return (boiler.main_content(pages, id_col="doc_id",
                                    stopwords_high=0.08, stopwords_low=0.03)
                .agg(F.sum("n_good"), F.sum("n_bad"),
                     F.sum("main_chars")).collect())

    @timed("q_percolate_200k", reps=3, pre=clean_room, record_samples=True)
    def _perc():  # 512-stored-query registry vs the full 200k-doc stream
        from fatespark.percolate import percolate
        vocab = ["the", "smith", "jones", "data", "batch", "join", "scan",
                 "merge", "big", "array", "sort", "column"]
        varr = F.array(*[F.lit(v) for v in vocab])
        pick = lambda j: F.element_at(
            varr, (F.pmod(F.xxhash64(F.col("id") * (j + 1) + j),
                          F.lit(len(vocab))) + 1).cast("int"))
        regs = spark.range(512).select(
            F.col("id").cast("int").alias("query_id"),
            F.array(pick(0), pick(1), pick(2)).alias("terms"),
            F.when(F.col("id") % 3 == 0, F.lit(2)).cast("int")
            .alias("min_match"))
        docs = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
        return percolate(docs, regs).count()

    @timed("tx_chunk_200k", reps=3, pre=clean_room, record_samples=True)
    def _chk():  # RAG passage chunking: 64-token windows, 16 overlap
        from fatespark.chunk import chunk_docs
        d = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
        return (chunk_docs(d, size=64, overlap=16)
                .agg(F.count(F.lit(1)), F.sum("n_tokens")).collect())

    @timed("tx_repetition_200k", reps=3, pre=clean_room, record_samples=True)
    def _rep():  # Gopher repetition signals, zero-shuffle narrow plan
        return (_textops.repetition_df(corpus.select("url", "text"))
                .select(F.sum("dup_line_frac"), F.sum("dup5gram_frac"))
                .collect())

    @timed("dd_substring_200k", reps=3, pre=clean_room, record_samples=True)
    def _sub():  # ExactSubstr-style window dedup: 30-token windows, stride 4
        d = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
        return (dedup.substring_dup_doc_stats(d, w=30, stride=4)
                .select(F.sum("dup_windows")).collect())

    @timed("dd_paradedup_200k", reps=3, pre=clean_room, record_samples=True)
    def _pd():  # CCNet corpus-wide paragraph dedup with text rewrite
        d = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
        return (dedup.paragraph_dedup_df(d)
                .select(F.sum("n_dropped")).collect())

    @timed("dd_substring_cut_200k", reps=3, pre=clean_room, record_samples=True)
    def _sc():  # ExactSubstr span surgery: 30-token windows, exact stride
        d = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
        return (dedup.substring_cut_df(d, w=30)
                .select(F.sum("n_cut")).collect())

    @timed("tx_decontam_200k", reps=3, pre=clean_room, record_samples=True)
    def _dec():  # 13-gram decontamination vs a 200-page "benchmark" set
        d = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
        bench_docs = corpus.limit(200).select(
            F.xxhash64("url").alias("doc_id"), "text")
        return (dedup.decontaminate_flags(d, bench_docs, n=13)
                .select(F.sum(F.col("contaminated").cast("long"))).collect())

    from fatespark import bpetrain as _bpetrain
    from fatespark import packing as _packing
    from fatespark import sampling as _sampling
    from fatespark import weburl as _weburl

    @timed("tx_pack_200k", reps=3, pre=clean_room, record_samples=True)
    def _pk():  # sequence packing: two-phase prefix-sum scan, ONE range
        # shuffle + two narrow passes (no single-partition window)
        d = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
        return (_packing.pack_sequences(d, budget=2048)
                .agg(F.max("seq_id"), F.sum("n_seqs")).collect())

    @timed("tx_mixture_200k", reps=3, pre=clean_room)
    def _mx():  # per-source token agg + broadcast plan + narrow scoring
        d = corpus.select(F.xxhash64("url").alias("doc_id"),
                          F.col("lang").alias("source"), "text")
        langs = [r["source"] for r in d.select("source").distinct().collect()]
        return (_sampling.mixture_sample(
                    d, {s: len(s) % 3 + 1 for s in langs},
                    token_budget=30_000_000)
                .agg(F.sum("n_copies")).collect())

    @timed("tx_url_filter_200k", reps=3, pre=clean_room)
    def _uf():  # 10k-domain broadcast blocklist + keyword rule, all narrow
        d = corpus.select(F.xxhash64("url").alias("doc_id"), "url")
        bl = [f"blocked{i}.test" for i in range(10_000)]
        return (_weburl.url_filter(d, blocked_domains=bl,
                                   blocked_substrings=["/p/1"])
                .agg(F.sum(F.col("keep").cast("long"))).collect())

    @timed("tx_bpe_train_200k", reps=3, pre=clean_room,
           record_samples=True)
    def _bt():  # 8 BPE merge rounds: ONE corpus shuffle, then vocab-scale
        return _bpetrain.bpe_train(corpus.select("text"), n_merges=8)

    _bpe_merges = [(a, b) for _, a, b, _ in _bpetrain.bpe_train(
        corpus.select("text").limit(20000), n_merges=8)]

    @timed("tx_bpe_encode_200k", reps=3, pre=clean_room,
           record_samples=True)
    def _be():  # apply side: distinct words encoded once, one doc_id agg
        return _bpetrain.bpe_encode(
            corpus.select(F.xxhash64("url").alias("doc_id"), "text"),
            _bpe_merges).agg(F.sum("n_tokens")).collect()

    @timed("tx_html_extract_200k", reps=3, pre=clean_room)
    def _hx():  # general markup -> text, pure JVM regexp chain, zero
        # shuffles (runs inside the scan stage)
        from fatespark import htmlx as _htmlx
        return (_htmlx.extract_pages(corpus.select("url", "html"),
                                     out_col="t")
                .agg(F.sum(F.length("t"))).collect())

    # WARC blob table (200 blobs x ~1000 records) materialized once,
    # untimed — the timed entry measures the ingest split+parse fan-out
    from fatespark import warc as _warc
    warc_path = f"/tmp/fatespark_bench_warc_{n_pages}"
    if not os.path.exists(os.path.join(warc_path, "_SUCCESS")):
        _rec = _warc.warc_record_col(
            F.col("url"), F.lit("2026-01-01T00:00:00Z"),
            F.decode("html", "UTF-8"))
        (corpus.select((F.xxhash64("url") % 200).alias("blob_id"),
                       F.col("url"), _rec.alias("rec"))
         .groupBy("blob_id")
         .agg(F.array_join(F.transform(
             F.sort_array(F.collect_list(F.struct("url", "rec"))),
             lambda s: s["rec"]), _warc.CRLF + _warc.CRLF).alias("blob"))
         .write.mode("overwrite").parquet(warc_path))
    warc_blobs = spark.read.parquet(warc_path)

    @timed("tx_warc_parse_200k", pre=clean_room)
    def _wp():  # archive ingest: blob explode + header/body extracts
        return (_warc.read_warc(warc_blobs.select("blob"))
                .agg(F.count("*"), F.sum(F.length("body"))).collect())

    @timed("tx_sitemap_parse_200k", reps=3, pre=clean_room)
    def _smp():  # urlset blob explode + field extracts (warc shape)
        from fatespark import sitemap as _sm
        entries = corpus.select(
            (F.xxhash64("url") % 200).alias("blob_id"),
            F.concat(F.lit("<url><loc>"), F.col("url"),
                     F.lit("</loc><lastmod>2026-01-01</lastmod>"
                           "<priority>0.5</priority></url>")).alias("e"))
        blobs = (entries.groupBy("blob_id")
                 .agg(F.concat(F.lit("<urlset>"),
                               F.array_join(F.collect_list("e"), "\n"),
                               F.lit("</urlset>")).alias("xml")))
        return (_sm.parse_sitemap(blobs.select("xml"))
                .agg(F.count("*"), F.count("priority")).collect())

    @timed("wg_robots_200k", reps=3, pre=clean_room)
    def _wgr():  # parse 10k hosts' robots.txt (window work over tiny
        # per-host groups) + gate 200k urls (broadcast join, struct max)
        from fatespark import robots as _robots
        hosts = spark.range(10_000).select(
            F.concat(F.lit("h"), F.col("id").cast("string"),
                     F.lit(".test")).alias("host"),
            F.concat(F.lit("User-agent: *\nDisallow: /private\n"
                           "Allow: /private/pub\nDisallow: /tmp")
                     ).alias("robots_txt"))
        urls = corpus.select(F.concat(
            F.lit("http://h"),
            F.pmod(F.xxhash64("url"), F.lit(10_000)).cast("string"),
            F.lit(".test/private/"), F.substring("url", -8, 8))
            .alias("u"))
        rules = _robots.parse_robots(hosts)
        return (_robots.robots_filter(urls, rules, url_col="u")
                .agg(F.sum(F.col("allowed").cast("long"))).collect())

    @timed("wg_links_200k", pre=clean_room)
    def _wgl():  # href/anchor extraction over the full page markup:
        # regexp scan + one narrow explode; three planted anchors/page
        from fatespark import linkgraph as _lg
        i = F.pmod(F.xxhash64("url"), F.lit(n_pages))
        d1 = F.pmod(i * 7 + 13, F.lit(n_pages)).cast("string")
        pages = corpus.select("url", F.concat(
            F.decode("html", "UTF-8"),
            F.lit('<a href="http://s'), d1, F.lit('.test/p">go <b>'),
            d1, F.lit('</b> now</a><a href="http://s0.test/p">home</a>')
        ).alias("html"))
        return (_lg.extract_links(pages).agg(F.count("*")).collect())

    @timed("wg_pagerank_200k", reps=3, pre=clean_room,
           record_samples=True)
    def _wgp():  # integer-exact PageRank, 5 iterations over a 200k-node
        # / 600k-edge affine graph with a head hub (node 0): per
        # iteration one src-partitioned join + one combinable agg
        from fatespark import linkgraph as _lg
        nodes = spark.range(n_pages).select(F.col("id").alias("src"))
        edges = nodes.select("src", F.explode(F.array(
            F.pmod(F.col("src") * 7 + 13, F.lit(n_pages)),
            F.pmod(F.col("src") * 31 + 7, F.lit(n_pages)),
            F.lit(0).cast("long"))).alias("dst")).where(
                F.col("src") % 10 != 0)
        return (_lg.pagerank(edges, iterations=5)
                .agg(F.sum("rank")).collect())

    @timed("wg_hits_200k", reps=3, pre=clean_room)
    def _wgh():  # integer-exact HITS, 5 iterations over the same
        # 200k-node affine graph (two pagerank-shaped halves/round)
        from fatespark import linkgraph as _lg
        nodes = spark.range(n_pages).select(F.col("id").alias("src"))
        edges = nodes.select("src", F.explode(F.array(
            F.pmod(F.col("src") * 7 + 13, F.lit(n_pages)),
            F.pmod(F.col("src") * 31 + 7, F.lit(n_pages)),
            F.lit(0).cast("long"))).alias("dst")).where(
                F.col("src") % 10 != 0)
        return (_lg.hits(edges, iterations=5)
                .agg(F.sum("hub"), F.sum("authority")).collect())

    @timed("tx_decontam_fuzzy_200k", reps=3, pre=clean_room,
           record_samples=True)
    def _dcf():  # MinHash cross-set flags vs a 200-page eval set; bench
        # bands broadcast, corpus never shuffled for candidates
        d = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
        bench_docs = corpus.limit(200).select(
            F.xxhash64("url").alias("doc_id"), "text")
        return (dedup.decontaminate_fuzzy_flags(d, bench_docs,
                                                threshold=0.5)
                .agg(F.sum(F.col("fuzzy_contaminated").cast("long")))
                .collect())

    clean_room()

    @timed("dd_exact")
    def _ex():
        return dedup.exact_duplicate_groups(docs).count()

    @timed("ann_topk")
    def _ann():
        qv = emb.limit(1).collect()[0]["embedding"]
        return ann.cosine_topk(emb, list(qv), k=10).collect()

    @timed("dd_embdup_banded", reps=3)
    def _ebd():
        return dedup.embedding_dup_pairs_banded(
            emb, threshold=0.9, n_bands=8, planes_per_band=8,
            dim=64).count()

    @timed("q_hits", reps=3)
    def _qh():  # per-hit enumeration throughput (reference Hits granularity)
        return idx.find_all(["smith", "jones"]).count()

    # -- persisted LSH ANN index: probe cost must NOT scale with corpus ------
    # deterministic synthetic embeddings at two sizes; same probe at both.
    # With partitionBy(lsh_bucket) + physical partition pruning the probe
    # reads ~n_probes/2^n_planes of the corpus, so wall time stays flat.
    import numpy as np
    import pandas as pd
    from fatespark.corpus import splitmix64

    def _synth_emb(n):
        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy(np.int64)
                iidx = (ids[:, None].astype(np.uint64) * np.uint64(64)
                        + np.arange(64, dtype=np.uint64)[None, :])
                vecs = (splitmix64(iidx).astype(np.float64)
                        / np.float64(2**64) - 0.5)
                yield pd.DataFrame({
                    "vec_id": ids,
                    "embedding": [v.astype(np.float32).tolist()
                                  for v in vecs]})
        return spark.range(n).repartition(cpus).mapInPandas(
            gen, "vec_id long, embedding array<float>")

    qv_iidx = np.arange(64, dtype=np.uint64)
    qv = (splitmix64(qv_iidx).astype(np.float64) / np.float64(2**64)
          - 0.5).tolist()
    for sz, tag in ((10_000, "10k"), (100_000, "100k")):
        lsh_path = f"/tmp/fatespark_bench_lsh_{tag}"

        @timed(f"ann_lsh_build_{tag}", reps=3)
        def _lb(sz=sz, lsh_path=lsh_path):
            return ann.LshVectorIndex.build(_synth_emb(sz), lsh_path,
                                            dim=64, n_planes=8)
        lsh_idx = _lb

        @timed(f"ann_lsh_probe_{tag}", reps=3)
        def _lq(lsh_idx=lsh_idx):
            return lsh_idx.topk(spark, qv, k=10, n_probes=16).collect()

    # IVF (trained coarse quantizer): build includes the k-means pass, so
    # it costs ~n_iters+1 assignment scans vs LSH's single hash pass;
    # probes should match LSH's flat-in-corpus-size profile
    for sz, tag in ((10_000, "10k"), (100_000, "100k")):
        ivf_path = f"/tmp/fatespark_bench_ivf_{tag}"

        @timed(f"ann_ivf_build_{tag}",
               reps=3 if tag == "100k" else 1, pre=clean_room,
               record_samples=True)
        def _ib(sz=sz, ivf_path=ivf_path):
            return ann.IvfVectorIndex.build(
                _synth_emb(sz), ivf_path, dim=64,
                n_centroids=max(8, sz // 2500), n_iters=2)
        ivf_idx = _ib

        @timed(f"ann_ivf_probe_{tag}", reps=3)
        def _iq(ivf_idx=ivf_idx):
            return ivf_idx.topk(spark, qv, k=10, n_probes=3).collect()

    # Product quantization: build trains m_sub=4 codebooks + writes the
    # int-code table; the ADC probe scans codes JVM-side (no exchange
    # before the bounded top-k) and exact-reranks the pool
    pq_path = "/tmp/fatespark_bench_pq_100k"

    def _fresh_pq_dir():
        shutil.rmtree(pq_path, ignore_errors=True)
        clean_room()

    @timed("ann_pq_build_100k", reps=3, pre=_fresh_pq_dir,
           record_samples=True)
    def _pqb():
        return ann.PqVectorIndex.build(_synth_emb(100_000), pq_path,
                                       dim=64, m_sub=4, n_centroids=8,
                                       n_iters=2)
    pq_idx = _pqb

    @timed("ann_pq_probe_100k", reps=3)
    def _pqq():
        return pq_idx.topk(spark, qv, k=10).collect()

    # Scalar quantization (Lucene 9.9 SQ): build = one 2-scalar stats agg
    # + a narrow encode write; probe = int64 code-dot candidate top-50
    # (TakeOrderedAndProject, no wide exchange) + pool-bounded rerank
    from fatespark.sq8 import Sq8VectorIndex as _Sq8
    sq8_path = "/tmp/fatespark_bench_sq8_100k"

    def _fresh_sq8_dir():
        shutil.rmtree(sq8_path, ignore_errors=True)
        clean_room()

    @timed("ann_sq8_build_100k", reps=3, pre=_fresh_sq8_dir,
           record_samples=True)
    def _sq8b():
        return _Sq8.build(_synth_emb(100_000), sq8_path, dim=64)
    sq8_idx = _sq8b

    @timed("ann_sq8_probe_100k", reps=3)
    def _sq8q():
        return sq8_idx.topk(spark, qv, k=10, pool=50).collect()

    # Geo serving surface: narrow trig projection + k-bounded top-k
    # (geo_knn) and one combinable count per Mercator tile (geo_grid)
    from fatespark import geo as _geo

    def _geo_pts_bench(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 37 % 161) - 80).cast("double").alias("lat"),
            ((F.col("id") * 61 % 361) - 180).cast("double").alias("lon"))

    @timed("geo_knn_200k", reps=3, pre=clean_room)
    def _gknn():
        return _geo.geo_distance_topk(_geo_pts_bench(200_000),
                                      47.0, 9.0, k=10).collect()

    @timed("geo_grid_200k", reps=3, pre=clean_room)
    def _ggrid():
        return _geo.geotile_grid(_geo_pts_bench(200_000), 7).count()

    # -- round-4 session-8 serving ops ---------------------------------------
    _ps_docs = corpus.select(F.xxhash64("url").alias("doc_id"), "text")

    @timed("q_phrase_suggest", reps=3, pre=clean_room)
    def _psg():  # whole-query did-you-mean: banded candidates + 3
        # candidate-filtered corpus passes for the bigram LM
        from fatespark.phrasesuggest import phrase_suggest
        return phrase_suggest(idx, _ps_docs, ["smiht", "jnoes"],
                              k=5, m=5, max_edit=2).collect()

    @timed("q_synonym_graph", reps=3)
    def _syng():  # multi-word synonym clause + plain term, 2 positions
        return idx.search_synonym_graph(
            ["smith", "taylor"], {"smith": ["smith jones"]},
            k=10).collect()

    @timed("q_hybrid_linear", reps=3)
    def _hyl():  # min-max-normalized weighted fusion over the same arms
        from fatespark.hybrid import hybrid_linear
        return hybrid_linear(idx, _synth_emb(100_000), ["smith", "jones"],
                             qv, k=10, n_candidates=50,
                             use_wand=True).collect()

    @timed("q_composite_agg", reps=3)
    def _cmp():  # one combinable count agg + bounded page
        from fatespark.composite import composite_agg, histogram_source
        return composite_agg(
            corpus, [("lang", F.col("lang")),
                     ("hlen", histogram_source(
                         F.length(F.coalesce(F.col("text"), F.lit(""))),
                         64.0))], size=10).collect()

    @timed("ann_maxsim_100k", reps=3, pre=clean_room)
    def _msim():  # ColBERT MaxSim: 4x16 token vectors, int64 dots,
        # one codegen projection + bounded top-k over 100k vectors
        from fatespark.maxsim import maxsim_topk, split_multivector
        qtoks = [list(qv[i * 16:(i + 1) * 16]) for i in range(4)]
        return maxsim_topk(_synth_emb(100_000), qtoks, k=10,
                           tokens_col=split_multivector("embedding",
                                                        4, 16)).collect()

    # -- round-4 session-9 serving ops ---------------------------------------
    from fatespark.sortedindex import build_sorted as _bsrt, \
        search_sorted_early as _sse
    _sorted_dir = "/tmp/fatespark_bench_idx_sorted"
    _srt_corpus = corpus.select(
        F.xxhash64("url").alias("doc_id"), "text",
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"))

    def _fresh_sorted_dir():
        clean_room()
        shutil.rmtree(_sorted_dir, ignore_errors=True)

    @timed("build_sorted_200k", reps=3, pre=_fresh_sorted_dir)
    def _srtb():  # Lucene index sorting: two-phase global rank (ONE range
        # shuffle) + the ordinary build with doc_id = rank
        return _bsrt(spark, _srt_corpus, _sorted_dir, "n_chars",
                     config=BuildConfig(n_buckets=8, salt_bits=1,
                                        block_size=128),
                     build_id="bench-sorted")
    sorted_idx = _srtb

    @timed("q_sorted_early", reps=3)
    def _sseq():  # early-terminated "top-10 longest matching docs":
        # galloping first_doc < T range probes read a posting-list PREFIX
        return _sse(sorted_idx, ["smith", "jones"], k=10,
                    mode="AND").collect()

    @timed("agg_top_hits_200k", reps=3)
    def _tha():  # ES terms+top_hits: per-lang 3 longest matching docs,
        # one window shuffle on the group key
        from fatespark.bucketaggs import top_hits_agg
        return top_hits_agg(idx, _srt_corpus.join(
            corpus.select(F.xxhash64("url").alias("doc_id"), "lang"),
            "doc_id"), ["smith", "jones"], "lang", "n_chars",
            n=3, mode="OR").collect()

    @timed("agg_adjacency_200k", reps=3)
    def _adj():  # ES adjacency_matrix: 3 filters + pairwise intersections
        from fatespark.bucketaggs import adjacency_matrix_agg
        return adjacency_matrix_agg(
            idx, {"a": ["smith"], "b": ["jones"],
                  "c": ["taylor"]}).collect()

    # -- round-4 session-10 operators ---------------------------------------
    @timed("agg_has_child_200k", reps=3)
    def _hc():  # ES has_child block join: ~200 parents of 997, ranked by
        # the SUM of matching-child BM25 codes (one parent-key shuffle)
        from fatespark.blockjoin import has_child_topk
        ch = corpus.select(
            F.xxhash64("url").alias("doc_id"),
            F.pmod(F.xxhash64("url"), F.lit(997)).alias("pkey"))
        return has_child_topk(idx, ch, ["smith", "jones"], "pkey", k=10,
                              mode="OR", score_mode="sum").collect()

    @timed("agg_diversified_200k", reps=3)
    def _div():  # ES diversified_sampler: per-lang best-3 of the match set
        from fatespark.bucketaggs import diversified_sampler
        return diversified_sampler(
            idx, corpus.select(F.xxhash64("url").alias("doc_id"), "lang"),
            ["smith", "jones"], "lang", max_docs_per_value=3).collect()

    @timed("agg_date_pipeline_200k", reps=3)
    def _dhp():  # ES pipeline aggs: hourly warc_ts histogram (~56 buckets)
        # + derivative/cumulative_sum/moving_fn in one bounded window
        from fatespark.pipelineaggs import date_histogram_pipeline
        return date_histogram_pipeline(corpus, "warc_ts",
                                       interval="hour").collect()

    from fatespark.phrasesuggest import phrase_suggest as _psf, \
        write_bigram_lm as _wlm

    @timed("build_bigram_lm_200k", reps=3)
    def _lmb():  # one-time serving-side LM build (pairs/unigrams/meta)
        return _wlm(idx, _ps_docs)

    @timed("q_phrase_suggest_served", reps=3)
    def _psgs():  # the q_phrase_suggest query over the persisted LM:
        # candidate-pruned probes replace the three corpus passes
        return _psf(idx, _ps_docs, ["smiht", "jnoes"],
                    k=5, m=5, max_edit=2).collect()

    from fatespark.phrasesuggest import phrase_suggest_local as _psl

    @timed("ql_phrase_suggest", reps=3)
    def _psl_q():  # driver-local did-you-mean over BOTH persisted
        # sidecars (banded dictionary + bigram LM): zero Spark jobs
        return _psl(lidx, ["smiht", "jnoes"], k=5, m=5, max_edit=2)

    # -- round-4 session-2 operators ----------------------------------------
    @timed("q_msm", reps=3)
    def _msm():  # minimum_should_match floor: 2 of 3, same scan as q_or3
        return idx.search(["the", "smith", "zyzzyva"], k=10, mode="OR",
                          min_should_match=2).collect()

    from fatespark.hybrid import hybrid_rrf as _hy

    @timed("q_hybrid", reps=3)
    def _hyb():  # RRF fusion over (WAND text arm, 100k-vector cosine arm);
        # the fusion join itself is N-bounded — this measures arms + fuse
        return _hy(idx, _synth_emb(100_000), ["smith", "jones"], qv,
                   k=10, n_candidates=50, use_wand=True).collect()

    @timed("dd_semdedup_100k", reps=3, pre=clean_room, record_samples=True)
    def _sdd():  # SemDeDup: IVF train (2 narrow Lloyd passes) + assign +
        # per-(cell, tile) BLAS kernel over 100k synthetic vectors (the
        # numpy throughput kernel; the fold kernel is the oracle path)
        return (dedup.semdedup(_synth_emb(100_000), threshold=0.5,
                               n_centroids=64, n_iters=2, dim=64,
                               n_blocks=8, kernel="numpy")
                .agg(F.sum(F.col("keep").cast("long"))).collect())

    from fatespark.qualitymodel import pseudo_weights as _pw, \
        quality_logit_df as _qld
    _qw = _pw(256, seed=77)

    @timed("tx_quality_classifier_200k", reps=3, pre=clean_room)
    def _qlc():  # zero-shuffle literal-weight scoring over the full corpus
        return (_qld(corpus.select(F.xxhash64("url").alias("doc_id"),
                                   "text"), _qw, bias=0.05)
                .agg(F.sum(F.col("keep").cast("long")),
                     F.sum("logit")).collect())

    from fatespark.sessions import session_stats as _ss
    _sess_events = corpus.select(
        F.xxhash64("url").alias("event_id"),
        F.pmod(F.xxhash64("url", "lang"), F.lit(5000)).alias("user_id"),
        F.col("warc_ts").cast("timestamp").alias("ts"))

    @timed("q_sessionize_200k", reps=3, pre=clean_room)
    def _sess():  # one user_id shuffle: lag->flag->cumsum + two rollups
        return _ss(_sess_events, gap_seconds=1800).count()

    from fatespark.temporal import asof_join as _aj, interval_join as _ij
    # marker events (~1/7th): the as-of reference / interval-source side
    _markers = _sess_events.filter(
        F.pmod(F.col("event_id"), F.lit(7)) == 0).select(
        "user_id", "ts", F.col("event_id").alias("marker_id"))

    @timed("q_asof_join_200k", reps=3, pre=clean_room)
    def _asof():  # union/carry-forward: ONE user_id shuffle, no explosion
        return _aj(_sess_events, _markers, on=["user_id"],
                   right_cols=["marker_id"], how="inner").count()

    @timed("q_interval_join_200k", reps=3, pre=clean_room)
    def _ivj():  # bucketized range join: markers open 2h windows
        iv = _markers.select(
            "user_id", F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"))
        return _ij(_sess_events, iv, on=["user_id"],
                   bucket_width_us=3_600_000_000).count()

    # -- once-per-round linear-scaling probe of the heavy new-tier ops ------
    # same plans at 10x the pages (sf1-ish): a 200k-page suite can hide
    # super-linear behavior; ratios land in the artifact so the check is
    # auditable (healthy = roughly <= ~12x for 10x data on a fixed-core
    # host, per the shuffle/sort log factors)
    elapsed = time.time() - t_suite0
    if scale_pages > 0 and elapsed < budget:
        sp_path = f"/tmp/fatespark_bench_corpus_{scale_pages}"
        if not os.path.exists(os.path.join(sp_path, "_SUCCESS")):
            pages_df(spark, scale_pages, partitions=cpus * 4).write.mode(
                "overwrite").parquet(sp_path)
        big = spark.read.parquet(sp_path)
        big_d = big.select(F.xxhash64("url").alias("doc_id"), "text")
        clean_room()

        @timed("dd_substring_2m")
        def _sub2m():
            return (dedup.substring_dup_doc_stats(big_d, w=30, stride=4)
                    .select(F.sum("dup_windows")).collect())
        clean_room()

        @timed("dd_substring_cut_2m")
        def _sc2m():
            return (dedup.substring_cut_df(big_d, w=30)
                    .select(F.sum("n_cut")).collect())
        clean_room()

        @timed("tx_bigram_surprisal_2m")
        def _bsu2m():
            return _textops.bigram_surprisal_df(big_d).count()
        clean_room()

        @timed("geo_knn_2m")
        def _gknn2m():  # narrow scan + bounded top-k: must scale ~linear
            return _geo.geo_distance_topk(_geo_pts_bench(2_000_000),
                                          47.0, 9.0, k=10).collect()
        clean_room()

        big_ci = big_d.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)

        @timed("charindex_build_100k")
        def _cib2m():
            return _ci.CharIndex.build(
                big_ci, "/tmp/fatespark_bench_charidx_100k",
                k=8, n_buckets=64)
        clean_room()

        _srt2m_dir = "/tmp/fatespark_bench_idx_sorted_2m"
        shutil.rmtree(_srt2m_dir, ignore_errors=True)

        @timed("build_sorted_2m")
        def _srtb2m():  # rank shuffle + build at 10x: must scale ~linear
            return _bsrt(
                spark, big.select(
                    F.xxhash64("url").alias("doc_id"), "text",
                    F.length(F.coalesce(F.col("text"), F.lit("")))
                    .alias("n_chars")),
                _srt2m_dir, "n_chars",
                config=BuildConfig(n_buckets=8, salt_bits=1,
                                   block_size=128),
                build_id="bench-sorted-2m")
        srt2m = _srtb2m
        clean_room()

        @timed("q_sorted_early_2m")
        def _sseq2m():  # horizon is k-shaped, NOT corpus-shaped: latency
            # should stay near the 200k number, not 10x it
            return _sse(srt2m, ["smith", "jones"], k=10,
                        mode="AND").collect()
        clean_room()

        # iterative graph ops at 10x nodes/edges (round-4 ask #4: the one
        # tier without linearity evidence) — same affine graph, 2M nodes /
        # 6M edges, 5 rounds
        from fatespark import linkgraph as _lg2
        _gn2 = spark.range(scale_pages).select(F.col("id").alias("src"))
        _ge2 = _gn2.select("src", F.explode(F.array(
            F.pmod(F.col("src") * 7 + 13, F.lit(scale_pages)),
            F.pmod(F.col("src") * 31 + 7, F.lit(scale_pages)),
            F.lit(0).cast("long"))).alias("dst")).where(
                F.col("src") % 10 != 0)

        @timed("wg_pagerank_2m")
        def _wgp2m():
            return (_lg2.pagerank(_ge2, iterations=5)
                    .agg(F.sum("rank")).collect())
        clean_room()

        @timed("wg_hits_2m")
        def _wgh2m():
            return (_lg2.hits(_ge2, iterations=5)
                    .agg(F.sum("hub"), F.sum("authority")).collect())
        clean_room()

        # round-4 serving aggs at 10x (ask #7): MATCH-bounded downstream
        # claims certified against the 2M sorted index (standard layout,
        # doc_id = rank) + synthetic child/lang metadata keyed to it
        _idx2m = SearchIndex(spark, _srt2m_dir)

        @timed("q_percolate_2m")
        def _perc2m():  # registry x full 2M-doc stream (corpus-scan shaped)
            from fatespark.percolate import percolate
            vocab = ["the", "smith", "jones", "data", "batch", "join",
                     "scan", "merge", "big", "array", "sort", "column"]
            varr = F.array(*[F.lit(v) for v in vocab])
            pick = lambda j: F.element_at(
                varr, (F.pmod(F.xxhash64(F.col("id") * (j + 1) + j),
                              F.lit(len(vocab))) + 1).cast("int"))
            regs = spark.range(512).select(
                F.col("id").cast("int").alias("query_id"),
                F.array(pick(0), pick(1), pick(2)).alias("terms"),
                F.when(F.col("id") % 3 == 0, F.lit(2)).cast("int")
                .alias("min_match"))
            return percolate(big_d, regs).count()
        clean_room()

        @timed("agg_has_child_2m")
        def _hc2m():
            from fatespark.blockjoin import has_child_topk
            ch = spark.range(1, scale_pages + 1).select(
                F.col("id").alias("doc_id"),
                F.pmod(F.col("id"), F.lit(997)).alias("pkey"))
            return has_child_topk(_idx2m, ch, ["smith", "jones"], "pkey",
                                  k=10, mode="OR",
                                  score_mode="sum").collect()
        clean_room()

        @timed("agg_diversified_2m")
        def _div2m():
            from fatespark.bucketaggs import diversified_sampler
            langs = F.array(F.lit("en"), F.lit("de"), F.lit("ru"),
                            F.lit("fr"))
            meta = spark.range(1, scale_pages + 1).select(
                F.col("id").alias("doc_id"),
                F.element_at(langs, (F.pmod(F.col("id"), F.lit(4)) + 1)
                             .cast("int")).alias("lang"))
            return diversified_sampler(_idx2m, meta, ["smith", "jones"],
                                       "lang",
                                       max_docs_per_value=3).collect()
        clean_room()

        for big_name, small_name in [
                ("dd_substring_2m", "dd_substring_200k"),
                ("dd_substring_cut_2m", "dd_substring_cut_200k"),
                ("tx_bigram_surprisal_2m", "tx_bigram_surprisal_200k"),
                ("geo_knn_2m", "geo_knn_200k"),
                ("charindex_build_100k", "charindex_build_10k"),
                ("build_sorted_2m", "build_sorted_200k"),
                ("q_sorted_early_2m", "q_sorted_early"),
                ("wg_pagerank_2m", "wg_pagerank_200k"),
                ("wg_hits_2m", "wg_hits_200k"),
                ("q_percolate_2m", "q_percolate_200k"),
                ("agg_has_child_2m", "agg_has_child_200k"),
                ("agg_diversified_2m", "agg_diversified_200k")]:
            extra[f"scale_ratio_{big_name}"] = round(
                times[big_name] / max(times[small_name], 1e-9), 2)
        extra["scale_probe_pages"] = scale_pages
    elif scale_pages > 0:
        extra["scale_probe_skipped"] = (
            f"budget: {round(elapsed, 1)}s elapsed >= {budget}s")

    total = round(sum(times.values()), 4)
    out = {
        "metric": "fatespark index-build + BM25 query suite",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": cpus,
        **extra,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
