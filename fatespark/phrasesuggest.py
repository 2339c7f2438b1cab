"""Phrase spelling suggestion — the Elasticsearch phrase suggester.

Whole-query "did you mean" (ES ``suggest.phrase``, Lucene
``PhraseSuggester``): per-term correction candidates come from the term
suggester (``suggest.suggest`` — SymSpell deletion banding + exact
levenshtein verify, the ES ``direct_generator``), candidate PHRASES are
every combination with at most ``max_errors`` changed positions (ES
``max_errors``), and each phrase is scored by a word-bigram language
model trained on the corpus with stupid-backoff smoothing (Brants et al.
2007 — ES's ``stupid_backoff`` default, discount 0.4), the backoff
unigram Laplace-floored so unseen words never produce log(0):

    P(w_1)           = (cf(w_1) + 1) / (T + V)
    P(w_i | w_{i-1}) = bc(w_{i-1}, w_i) / cf(w_{i-1})   if bc > 0
                       discount * (cf(w_i) + 1) / (T + V) otherwise

with cf = corpus token count, bc = adjacent-bigram count, T = total
tokens, V = vocabulary size.  score(phrase) = sum of ln P in position
order.

Float determinism: every probability is ONE fixed expression over
integer counts and the phrase score sums the positions as one static
expression tree (the query is n terms — query-sized, never
data-dependent), so scores are bit-identical in the DuckDB twin and the
(score DESC, phrase ASC) order is exact across engines.  The returned
``score`` column is floor-quantized AFTER the ordering.

100 TB shape: candidate generation is the term suggester's banded
dictionary join (vocab-shaped; probes the persisted ``fuzzy_variants``
table when one matches); the phrase combination space is
query-bounded (<= m^n rows, driver-enumerated like the PRF feedback
set and the MMR pool); the three corpus passes are each one narrow
projection into a map-side-combinable agg whose OUTPUT is bounded —
bigram/unigram counts are filtered to the candidate vocabulary BEFORE
the explode emits anything (the array filter runs inside the row, so
the Generate only streams candidate pairs), totals/vocab are 1-row
aggs.  Nothing corpus-scale ever reaches the driver or a join.

Reference analogue: none (fates has no fuzzy surface at all,
``lib/suffix_array_reader.rb`` matches exact suffixes only) —
target-new, the web-search serving surface.
"""

from __future__ import annotations

import itertools
import os
import zlib

from pyspark.sql import DataFrame, functions as F

from .suggest import deletion_variants, suggest
from .textops import LOWER, UPPER, WS_RE, fold_col, tokens_col

__all__ = ["phrase_suggest", "phrase_suggest_sql", "write_bigram_lm",
           "LM_DIRNAME"]

LM_DIRNAME = "bigram_lm"


def write_bigram_lm(index, docs: DataFrame, *, text_col: str = "text",
                    n_buckets: int = 64) -> str:
    """Persist the phrase-suggester's language model under the index
    directory so served suggestions PROBE precomputed counts instead of
    running the three corpus passes per query (the ``fuzzy_variants``
    pattern one layer up the serving stack).

    Layout under ``{index_dir}/bigram_lm``:

    - ``pairs``: (t1, t2, bc) adjacent-bigram counts, partitioned by
      ``b1 = crc32(t1) % n_buckets`` and (t1, t2)-sorted within files —
      a probe filters ``b1 IN (...)`` (physical directory pruning) plus
      ``t1 IN (...) AND t2 IN (...)`` (row-group pruning), so per-query
      cost is candidate-bounded, independent of corpus size.  The table
      is bigram-vocabulary-shaped — the same asymptotics as the term
      dictionary one n-gram order up, built with ONE combinable count
      shuffle.
    - ``unigrams``: (t, cf) token counts, same bucketing on t.
    - ``lm_meta``: one row (tc = total tokens, vc = vocabulary size,
      n_buckets).

    Counts use EXACTLY the live path's tokenization expression, so
    served scores are bit-identical to the on-the-fly ones (the DuckDB
    twin keeps matching unchanged).

    Lifecycle: the LM is corpus statistics, so it shares the index's
    documented stats contract — tombstoned deletes leave it stale
    exactly like df/avgdl until the next vacuum/rebuild, at which point
    ``write_bigram_lm`` must re-run (same rule as ``fuzzy_variants``)."""
    toks = F.transform(tokens_col(text_col), fold_col)
    base = docs.select(toks.alias("toks"))
    root = f"{index.index_dir}/{LM_DIRNAME}"

    def bkt(col):
        return F.pmod(F.crc32(F.encode(col, "utf-8")),
                      F.lit(n_buckets)).cast("int")

    pair_expr = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.struct(F.element_at("toks", i).alias("t1"),
                           F.element_at("toks", i + 1).alias("t2")))
    (base.filter(F.size("toks") >= 2)
     .select(F.explode(pair_expr).alias("p"))
     .select("p.t1", "p.t2")
     .groupBy("t1", "t2").agg(F.count("*").alias("bc"))
     .withColumn("b1", bkt(F.col("t1")))
     .repartition(n_buckets, "b1")
     .sortWithinPartitions("b1", "t1", "t2")
     .write.mode("overwrite").partitionBy("b1").parquet(f"{root}/pairs"))
    (base.select(F.explode("toks").alias("t"))
     .groupBy("t").agg(F.count("*").alias("cf"))
     .withColumn("b1", bkt(F.col("t")))
     .repartition(n_buckets, "b1")
     .sortWithinPartitions("b1", "t")
     .write.mode("overwrite").partitionBy("b1")
     .parquet(f"{root}/unigrams"))
    tc_df = base.agg(F.sum(F.size("toks")).cast("long").alias("tc"))
    vc_df = (base.select(F.explode("toks").alias("t"))
             .agg(F.count_distinct("t").cast("long").alias("vc")))
    (tc_df.crossJoin(vc_df).withColumn("n_buckets", F.lit(n_buckets))
     .coalesce(1).write.mode("overwrite").parquet(f"{root}/lm_meta"))
    from .sidecars import stamp
    stamp(index.index_dir, LM_DIRNAME)
    return root


def phrase_suggest_local(lidx, qterms: list[str], *, k: int = 5,
                         m: int = 5, max_edit: int = 2,
                         max_errors: int = 2, discount: float = 0.4,
                         quantize: int = 6):
    """Driver-local phrase suggester — the ``ql_*`` serving-floor twin of
    ``phrase_suggest(depth=max_edit)`` (SymSpell COMPLETE mode) over a
    ``LocalSearchIndex`` whose directory carries BOTH persisted sidecars:
    ``fuzzy_variants`` (depth >= max_edit; candidates via
    ``_fuzzy_probe`` — O(query variants) row-group-pruned reads) and
    ``bigram_lm`` (``write_bigram_lm``; candidate-bucket-pruned local
    parquet reads). No Spark jobs anywhere on the path, so an
    interactive did-you-mean answers in milliseconds instead of the
    Spark job floor. Scoring replays the distributed float expressions
    op-for-op (same association, same position-order sum); output rows
    (phrase, n_errors, score) as a pandas DataFrame, (score DESC,
    phrase ASC), floor-quantized after ordering."""
    import glob as _glob
    import math

    import pyarrow.parquet as pq

    from .analysis import ascii_fold

    if not qterms:
        raise ValueError("phrase_suggest_local needs >= 1 query term")
    qterms = [q.lower() for q in qterms]
    sets = []
    for q in qterms:
        best = lidx._fuzzy_probe(ascii_fold(q), max_edit)
        if best is None:
            raise ValueError(
                "phrase_suggest_local needs a fuzzy_variants table at "
                f"depth >= {max_edit} (suggest.write_fuzzy_variants)")
        ordered = sorted(best.items(),
                         key=lambda x: (x[1][0], -x[1][1], x[0]))[:m]
        opts = [w for w, _ in ordered] or [q]
        sets.append([(w, 0 if w == q else 1) for w in opts])
    combos = [c for c in itertools.product(*sets)
              if sum(chg for _, chg in c) <= max_errors]
    import pandas as pd
    if not combos:
        return pd.DataFrame({"phrase": [], "n_errors": [], "score": []})

    root = os.path.join(lidx.index_dir, LM_DIRNAME)
    metas = sorted(_glob.glob(os.path.join(root, "lm_meta", "*.parquet")))
    if not metas:
        raise ValueError("phrase_suggest_local needs a bigram_lm "
                         "(phrasesuggest.write_bigram_lm)")
    meta = pq.read_table(metas[-1]).to_pandas().iloc[0]
    nb = int(meta["n_buckets"])
    denom = float(int(meta["tc"]) + int(meta["vc"]))

    cv = {w for c in combos for w, _ in c}
    cf: dict[str, int] = {}
    bc: dict[tuple, int] = {}
    for b in sorted({zlib.crc32(w.encode("utf-8")) % nb for w in cv}):
        ud = os.path.join(root, "unigrams", f"b1={b}")
        for f in sorted(_glob.glob(os.path.join(ud, "*.parquet"))):
            t = pq.read_table(f).to_pandas()
            for w, c in zip(t["t"], t["cf"]):
                if w in cv:
                    cf[w] = int(c)
        pd_ = os.path.join(root, "pairs", f"b1={b}")
        for f in sorted(_glob.glob(os.path.join(pd_, "*.parquet"))):
            t = pq.read_table(f).to_pandas()
            for a, w2, c in zip(t["t1"], t["t2"], t["bc"]):
                if a in cv and w2 in cv:
                    bc[(a, w2)] = int(c)

    rows = []
    for c in combos:
        words = [w for w, _ in c]
        s = math.log((float(cf.get(words[0], 0)) + 1.0) / denom)
        for i in range(1, len(words)):
            hit = bc.get((words[i - 1], words[i]))
            if hit is not None:
                s = s + math.log(float(hit) / float(cf[words[i - 1]]))
            else:
                s = s + math.log(discount
                                 * (float(cf.get(words[i], 0)) + 1.0)
                                 / denom)
        rows.append((" ".join(words), sum(chg for _, chg in c), s))
    rows.sort(key=lambda r: (-r[2], r[0]))
    mul = float(10 ** quantize)
    out = pd.DataFrame(rows[:k], columns=["phrase", "n_errors", "score"])
    out["score"] = (out["score"] * mul).map(math.floor) / mul
    return out


def _lm_tables(index, cv: list[str]):
    """Candidate-pruned (bigrams, unigrams, totals) from a persisted
    ``bigram_lm``, or None when the index has none."""
    root = f"{index.index_dir}/{LM_DIRNAME}"
    if not os.path.isdir(os.path.join(root, "lm_meta")):
        return None
    spark = index.spark
    meta = spark.read.parquet(f"{root}/lm_meta").collect()[0]
    nb = int(meta["n_buckets"])
    bks = sorted({zlib.crc32(w.encode("utf-8")) % nb for w in cv})
    pairs = (spark.read.parquet(f"{root}/pairs")
             .filter(F.col("b1").isin(bks)
                     & F.col("t1").isin(cv) & F.col("t2").isin(cv))
             .select("t1", "t2", "bc"))
    uni = (spark.read.parquet(f"{root}/unigrams")
           .filter(F.col("b1").isin(bks) & F.col("t").isin(cv))
           .select("t", "cf"))
    tot = spark.createDataFrame([(int(meta["tc"]),)], "tc long")
    voc = spark.createDataFrame([(int(meta["vc"]),)], "vc long")
    return pairs, uni, tot, voc


def _candidate_sets(index, qterms, *, m, max_edit, depth):
    """Per-position [(word, changed)] option lists, rank order preserved;
    a position with no dictionary candidate keeps its original term
    (changed=0) — the ES keep-original contract."""
    cand = suggest(index, qterms, k=m, max_edit=max_edit,
                   depth=depth).collect()
    by_q: dict[str, list[str]] = {}
    for r in cand:                       # rows arrive (qterm, rank)-ordered
        by_q.setdefault(r["qterm"], []).append(r["suggestion"])
    out = []
    for q in qterms:
        opts = by_q.get(q) or [q]
        out.append([(w, 0 if w == q else 1) for w in opts])
    return out


def phrase_suggest(index, docs: DataFrame, qterms: list[str], *,
                   k: int = 5, m: int = 5, max_edit: int = 2,
                   depth: int = 1, max_errors: int = 2,
                   discount: float = 0.4, quantize: int = 6,
                   collate: bool = False, collate_prune: bool = False,
                   text_col: str = "text", use_lm: bool = True) -> DataFrame:
    """(phrase, n_errors, score) — the ``k`` best corrections of the
    whole query, ES phrase-suggester semantics: per-term candidates from
    the SymSpell term suggester (top-``m`` each, edit distance <=
    ``max_edit`` under banding ``depth``), phrases with more than
    ``max_errors`` changed positions dropped, stupid-backoff bigram-LM
    scores over ``docs``, ordered (score DESC, phrase ASC).

    ``use_lm=True`` (default) probes a persisted ``write_bigram_lm``
    table under the index dir when one exists — candidate-bounded
    pruned reads instead of three corpus passes, scores bit-identical;
    without one (or ``use_lm=False``) the LM counts compute on the fly
    over ``docs``.

    ``collate=True`` runs the ES collate step — a phrase survives only
    if SOME document contains every one of its words (the conjunctive
    collate query).  With ``collate_prune=True`` (ES ``collate.prune``)
    failing phrases are kept and annotated with a ``collate_match``
    int column instead of dropped.  The check is ONE extra narrow scan:
    per-phrase containment conditions folded into a map-side-combinable
    max agg (phrase-bounded output, zero wide shuffles)."""
    if not qterms:
        raise ValueError("phrase_suggest needs >= 1 query term")
    qterms = [q.lower() for q in qterms]
    n = len(qterms)
    spark = index.spark

    sets = _candidate_sets(index, qterms, m=m, max_edit=max_edit,
                           depth=depth)
    combos = [c for c in itertools.product(*sets)
              if sum(chg for _, chg in c) <= max_errors]
    empty_schema = ("phrase string, n_errors int, score double"
                    + (", collate_match int" if collate_prune else ""))
    if not combos:
        return spark.createDataFrame([], empty_schema)
    cv = sorted({w for c in combos for w, _ in c})
    cvlit = F.array(*[F.lit(w) for w in cv])
    toks = F.transform(tokens_col(text_col), fold_col)
    base = docs.select(toks.alias("toks"))
    # served path: a persisted bigram_lm under the index dir answers the
    # LM counts with candidate-pruned probes (write_bigram_lm) instead of
    # three corpus passes — counts, hence scores, bit-identical
    lm = _lm_tables(index, cv) if use_lm else None

    cmatch: list[int] | None = None
    if collate or collate_prune:
        import functools
        conds = [functools.reduce(
            lambda a, b: a & b,
            [F.array_contains("toks", w)
             for w in dict.fromkeys(w for w, _ in c)])
            for c in combos]
        row = base.agg(*[F.max(c.cast("int")).alias(f"m{i}")
                         for i, c in enumerate(conds)]).collect()[0]
        cmatch = [int(row[f"m{i}"] or 0) for i in range(len(combos))]
        if not collate_prune:
            keep = [i for i, v in enumerate(cmatch) if v]
            combos = [combos[i] for i in keep]
            cmatch = None
            if not combos:
                return spark.createDataFrame([], empty_schema)

    rows = [tuple(w for w, _ in c)
            + (sum(chg for _, chg in c), " ".join(w for w, _ in c))
            + ((cmatch[i],) if cmatch is not None else ())
            for i, c in enumerate(combos)]
    wcols = [f"w_{i}" for i in range(n)]
    cdf = spark.createDataFrame(
        rows, ", ".join(f"{c} string" for c in wcols)
        + ", n_errors int, phrase string"
        + (", collate_match int" if cmatch is not None else ""))

    if lm is not None:
        big, uni, tot, voc = lm
    else:
        # adjacent bigrams, candidate-filtered INSIDE the row (the
        # Generate streams only matching pairs), then one combinable
        # count agg
        pair_expr = F.filter(
            F.transform(F.sequence(F.lit(1), F.size("toks") - 1),
                        lambda i: F.struct(
                            F.element_at("toks", i).alias("t1"),
                            F.element_at("toks", i + 1).alias("t2"))),
            lambda s: F.array_contains(cvlit, s["t1"])
            & F.array_contains(cvlit, s["t2"]))
        big = (base.filter(F.size("toks") >= 2)
               .select(F.explode(pair_expr).alias("p"))
               .select("p.t1", "p.t2")
               .groupBy("t1", "t2").agg(F.count("*").alias("bc")))
        uni = (base.select(F.explode(
                   F.filter(F.col("toks"),
                            lambda x: F.array_contains(cvlit, x)))
                   .alias("t"))
               .groupBy("t").agg(F.count("*").alias("cf")))
        tot = base.agg(F.sum(F.size("toks")).cast("long").alias("tc"))
        voc = (base.select(F.explode("toks").alias("t"))
               .agg(F.count_distinct("t").cast("long").alias("vc")))

    out = cdf
    for i in range(n):
        out = out.join(
            F.broadcast(uni.select(F.col("t").alias(f"_t{i}"),
                                   F.col("cf").alias(f"_cf{i}"))),
            out[f"w_{i}"] == F.col(f"_t{i}"), "left").drop(f"_t{i}")
    for i in range(1, n):
        out = out.join(
            F.broadcast(big.select(F.col("t1").alias(f"_b1{i}"),
                                   F.col("t2").alias(f"_b2{i}"),
                                   F.col("bc").alias(f"_bc{i}"))),
            (out[f"w_{i-1}"] == F.col(f"_b1{i}"))
            & (out[f"w_{i}"] == F.col(f"_b2{i}")), "left") \
            .drop(f"_b1{i}").drop(f"_b2{i}")
    out = out.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(voc))

    denom = (F.col("tc") + F.col("vc")).cast("double")
    score = F.log((F.coalesce(F.col("_cf0"), F.lit(0)).cast("double")
                   + F.lit(1.0)) / denom)
    for i in range(1, n):
        backoff = F.log(F.lit(discount)
                        * (F.coalesce(F.col(f"_cf{i}"), F.lit(0))
                           .cast("double") + F.lit(1.0)) / denom)
        hit = F.log(F.col(f"_bc{i}").cast("double")
                    / F.col(f"_cf{i-1}").cast("double"))
        score = score + F.when(F.col(f"_bc{i}").isNotNull(), hit) \
                         .otherwise(backoff)
    mul = float(10 ** quantize)
    extra = ["collate_match"] if cmatch is not None else []
    return (out.select("phrase", "n_errors", score.alias("_s"), *extra)
            .orderBy(F.col("_s").desc(), F.col("phrase").asc())
            .limit(k)
            .select("phrase", "n_errors",
                    (F.floor(F.col("_s") * mul) / mul).alias("score"),
                    *extra))


def phrase_suggest_sql(src: str, qterms: list[str], *, k: int = 5,
                       m: int = 5, max_edit: int = 2, depth: int = 1,
                       max_errors: int = 2, discount: float = 0.4,
                       quantize: int = 6, collate: bool = False,
                       collate_prune: bool = False,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB twin of ``phrase_suggest`` over the raw document table —
    same banding, same candidate cut, same keep-original fallback, same
    LM expressions, same ordering; hash-exact.  The candidate generation
    replays the term suggester's depth-``depth`` deletion banding (the
    ft_suggest-oracle precedent) so the generator's semantics are part
    of what is checked."""
    if not qterms:
        raise ValueError("phrase_suggest_sql needs >= 1 query term")
    qterms = [q.lower() for q in qterms]
    n = len(qterms)
    ws_sql = r"[ \t\n\r\f\v]+"          # RE2 spelling of WS_RE
    var_expr = ("list_distinct(list_append("
                "list_transform(range(1, length(term) + 1), "
                "i -> substr(term, 1, i - 1) || substr(term, i + 1)), "
                "term))")
    if depth != 1 and depth < max_edit:
        raise NotImplementedError(
            "SQL twin supports depth-1 bands (the suggester default) or "
            "complete mode (depth >= max_edit)")
    # complete mode (depth >= max_edit): banding provably equals the plain
    # levenshtein <= max_edit dictionary predicate (the SymSpell theorem),
    # so the twin states the candidate set directly — the ft_fuzzy2-oracle
    # precedent
    complete = depth != 1
    mul = float(10 ** quantize)

    parts = [f"""
tokset AS (
  SELECT list_transform(
           list_filter(regexp_split_to_array(coalesce({text_col}, ''),
                                             '{ws_sql}'), x -> x <> ''),
           x -> translate(x, '{UPPER}', '{LOWER}')) AS toks
  FROM {src}
),
ptok AS (SELECT unnest(toks) AS term FROM tokset),
pdfs AS (
  SELECT term, count(DISTINCT {id_col}) AS df
  FROM (SELECT {id_col}, unnest(toks) AS term
        FROM (SELECT {id_col}, list_transform(
                list_filter(regexp_split_to_array(coalesce({text_col}, ''),
                                                  '{ws_sql}'), x -> x <> ''),
                x -> translate(x, '{UPPER}', '{LOWER}')) AS toks
              FROM {src}))
  GROUP BY term
),
dvar AS (
  SELECT term, df, unnest({var_expr}) AS variant FROM pdfs
)"""]
    for i, q in enumerate(qterms):
        if complete:
            cand_src = f"""(SELECT term, df,
                 levenshtein('{q}', term) AS dist
          FROM pdfs
          WHERE abs(length(term) - {len(q)}) <= {max_edit}
            AND levenshtein('{q}', term) <= {max_edit})"""
        else:
            qvars = ", ".join(f"('{v}')"
                              for v in deletion_variants(q, depth=1))
            cand_src = f"""(SELECT DISTINCT d.term, d.df,
                 levenshtein('{q}', d.term) AS dist
          FROM (SELECT DISTINCT variant
                FROM (VALUES {qvars}) v(variant)) qv
          JOIN dvar d USING (variant)
          WHERE levenshtein('{q}', d.term) <= {max_edit})"""
        parts.append(f"""
cand{i} AS (
  SELECT w, chg FROM (
    SELECT term AS w,
           CASE WHEN term <> '{q}' THEN 1 ELSE 0 END AS chg,
           row_number() OVER (ORDER BY dist ASC, df DESC, term ASC) AS rnk
    FROM {cand_src})
  WHERE rnk <= {m}
),
pos{i} AS (
  SELECT w, chg FROM cand{i}
  UNION ALL
  SELECT '{q}', 0 WHERE NOT EXISTS (SELECT 1 FROM cand{i})
)""")
    wsel = ", ".join(f"p{i}.w AS w{i}" for i in range(n))
    chg = " + ".join(f"p{i}.chg" for i in range(n))
    phrase = " || ' ' || ".join(f"p{i}.w" for i in range(n))
    joins = " CROSS JOIN ".join(f"pos{i} p{i}" for i in range(n))
    parts.append(f"""
combos AS (
  SELECT {wsel}, CAST({chg} AS INTEGER) AS n_errors,
         {phrase} AS phrase
  FROM {joins}
  WHERE {chg} <= {max_errors}
),
cv AS (SELECT DISTINCT w FROM ({" UNION ALL ".join(
    f"SELECT w FROM pos{i}" for i in range(n))})),
big AS (
  SELECT t1, t2, count(*) AS bc
  FROM (SELECT toks[i] AS t1, toks[i+1] AS t2
        FROM tokset, unnest(range(1, len(toks))) AS u(i))
  WHERE t1 IN (SELECT w FROM cv) AND t2 IN (SELECT w FROM cv)
  GROUP BY t1, t2
),
uni AS (
  SELECT term AS t, count(*) AS cf FROM ptok
  WHERE term IN (SELECT w FROM cv) GROUP BY term
),
tot AS (SELECT count(*) AS tc FROM ptok),
voc AS (SELECT count(DISTINCT term) AS vc FROM ptok)""")
    if collate or collate_prune:
        warr = ", ".join(f"combos.w{i}" for i in range(n))
        parts.append(f"""
coll AS (
  SELECT phrase,
         max(CASE WHEN list_has_all(t.toks, [{warr}])
             THEN 1 ELSE 0 END) AS cm
  FROM combos, tokset t GROUP BY phrase
)""")
    score = [f"ln((coalesce(u0.cf, 0) + 1.0) "
             f"/ CAST(tc + vc AS DOUBLE))"]
    for i in range(1, n):
        score.append(
            f"(CASE WHEN b{i}.bc IS NOT NULL THEN "
            f"ln(CAST(b{i}.bc AS DOUBLE) / CAST(u{i-1}.cf AS DOUBLE)) "
            f"ELSE ln({discount!r} * (coalesce(u{i}.cf, 0) + 1.0) "
            f"/ CAST(tc + vc AS DOUBLE)) END)")
    ujoins = "\n  ".join(
        f"LEFT JOIN uni u{i} ON u{i}.t = combos.w{i}" for i in range(n))
    bjoins = "\n  ".join(
        f"LEFT JOIN big b{i} ON b{i}.t1 = combos.w{i-1} "
        f"AND b{i}.t2 = combos.w{i}" for i in range(1, n))
    cjoin = cwhere = csel_in = csel_out = ""
    if collate and not collate_prune:
        cjoin = "\n  JOIN coll USING (phrase)"
        cwhere = "\n  WHERE coll.cm = 1"
    elif collate_prune:
        cjoin = "\n  JOIN coll USING (phrase)"
        csel_in = ", coll.cm AS collate_match"
        csel_out = ", collate_match"
    return f"""
WITH {",".join(parts)}
SELECT phrase, n_errors, floor(s * {mul}) / {mul} AS score{csel_out}
FROM (
  SELECT phrase, n_errors, {" + ".join(score)} AS s{csel_in}
  FROM combos
  {ujoins}
  {bjoins}
  CROSS JOIN tot CROSS JOIN voc{cjoin}{cwhere}
) ORDER BY s DESC, phrase ASC LIMIT {k}"""
