"""Text-analysis operators for large-scale training-data pipelines:
token counting, document fingerprinting, quality scoring, language ID.

Every operator here is a pure Spark Column expression (JVM-side, whole-stage
codegen, no Python in the hot path) built from the same ASCII-whitespace /
ASCII-fold primitives as the index analyzer, and each has an exact ANSI-SQL
twin for the DuckDB oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
LOWER = "abcdefghijklmnopqrstuvwxyz"
WS_RE = "[ \\t\\n\\r\\f\\x0B]+"
PUNCT_RE = "[!-/:-@\\[-`{-~]"          # ASCII punctuation ranges
DIGIT_RE = "[0-9]"
CYRILLIC_RE = "[\\u0400-\\u04FF]"

EN_STOPWORDS = ["the", "of", "and", "to", "a", "in", "is", "for", "on", "with"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit",
                "für", "von"]


def fold_col(c):
    """ASCII-only lowercase — JVM twin of analysis.ascii_fold."""
    return F.translate(c, UPPER, LOWER)


def tokens_col(text_col: str):
    """array of raw tokens (ASCII-whitespace split, empties dropped)."""
    return F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), WS_RE),
                    lambda x: x != F.lit(""))


def token_count_col(text_col: str):
    return F.size(tokens_col(text_col))


IDENT_RE = "[A-Za-z_][A-Za-z0-9_]*"

# GPT-2-style pre-tokenizer segmentation (BPE-ish), restricted to constructs
# with identical semantics in Java regex (Spark) and RE2 (DuckDB): ASCII
# classes only (\p{L} unicode tables can differ by engine version), no
# lookahead (RE2 has none — the original GPT-2 pattern's trailing
# ``\s+(?!\S)`` branch is dropped), and although this DOES use alternation,
# both engines pick branches leftmost-first (RE2's default is Perl-like,
# not POSIX leftmost-longest), verified by the cross-engine tests. Segments
# tile the input exactly: contraction suffix | optional-space letter run |
# optional-space digit run | optional-space other-symbol run | whitespace
# run.
BPE_RE = ("'(?:s|t|re|ve|m|ll|d)"
          "| ?[A-Za-z]+"
          "| ?[0-9]+"
          "| ?[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]+"
          "|[ \\t\\n\\r\\f\\x0B]+")


def bpe_token_count_col(text_col: str):
    """Count of BPE-ish pre-tokenizer segments (GPT-2 pretokenize shape):
    the standard first-stage split a byte-pair encoder runs before merges,
    so this is the scan-speed proxy for "how many BPE tokens will this doc
    cost" that corpus budgeting pipelines use. Pure JVM ``regexp_count``
    (whole-stage codegen); exact DuckDB twin via ``regexp_extract_all``
    over the same pattern. Reference analogue: none (target-new
    training-data op)."""
    return F.regexp_count(F.coalesce(F.col(text_col), F.lit("")),
                          F.lit(BPE_RE))


def identifier_count_col(text_col: str):
    """Count of identifier tokens — the JVM twin of the reference's
    SimpleIdentifierAnalyzer (``lib/analysis/simple_identifier_analyzer.rb:
    15-23``: runs of ``[A-Za-z_][A-Za-z0-9_]*``, everything else a
    separator; ``"1"`` and ``"$@!"`` yield none). Same non-overlapping
    left-to-right match semantics in Java regex and RE2, so it is DuckDB
    oracle-checkable."""
    return F.regexp_count(F.coalesce(F.col(text_col), F.lit("")),
                          F.lit(IDENT_RE))


def normalized_text_col(text_col: str):
    """Canonical doc text: ASCII-fold + collapse whitespace runs to single
    spaces + trim — the exact-dedup key."""
    collapsed = F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")),
                                 WS_RE, " ")
    return F.trim(fold_col(collapsed))


def fingerprint_col(text_col: str):
    """Deterministic content fingerprint: md5 hex of the normalized text."""
    return F.md5(normalized_text_col(text_col))


def _ratio(num, den):
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def punct_ratio_col(text_col: str):
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, PUNCT_RE, ""))
    return _ratio(n_punct, F.length(t))


def digit_ratio_col(text_col: str):
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_dig = F.length(t) - F.length(F.regexp_replace(t, DIGIT_RE, ""))
    return _ratio(n_dig, F.length(t))


def stopword_ratio_col(text_col: str, stopwords: list[str] | None = None):
    sw = stopwords or EN_STOPWORDS
    toks = tokens_col(text_col)
    hits = F.size(F.filter(toks, lambda x: fold_col(x).isin(sw)))
    return _ratio(hits, F.size(toks))


def mean_token_len_col(text_col: str):
    toks = tokens_col(text_col)
    total = F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, x: acc + F.length(x))
    return _ratio(total, F.size(toks))


def quality_score_col(text_col: str):
    """Heuristic [0,1] web-text quality score (Gopher/C4-style signals):
    rewards a healthy stopword ratio and 3-10 char mean token length,
    penalizes punctuation/digit-heavy text and very short docs.

    score = 0.3*min(1, n_tokens/20) + 0.3*min(1, stop_ratio*5)
          + 0.2*(1 - min(1, punct_ratio*5)) + 0.1*(1 - min(1, digit_ratio*5))
          + 0.1*(case mean_tok_len between 3 and 10 -> 1 else 0)
    """
    ntok = token_count_col(text_col).cast("double")
    stop = stopword_ratio_col(text_col)
    punct = punct_ratio_col(text_col)
    dig = digit_ratio_col(text_col)
    mtl = mean_token_len_col(text_col)
    return (
        F.lit(0.3) * F.least(F.lit(1.0), ntok / F.lit(20.0))
        + F.lit(0.3) * F.least(F.lit(1.0), stop * F.lit(5.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(1.0), punct * F.lit(5.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(F.lit(1.0), dig * F.lit(5.0)))
        + F.lit(0.1) * F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(1.0))
                        .otherwise(F.lit(0.0)))


def cyrillic_ratio_col(text_col: str):
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_cyr = F.length(t) - F.length(F.regexp_replace(t, CYRILLIC_RE, ""))
    return _ratio(n_cyr, F.length(t))


def lang_pred_col(text_col: str):
    """n-gram-free heuristic language ID: Cyrillic char share → 'ru';
    else German vs English stopword-hit counts; ties → 'en'."""
    toks = tokens_col(text_col)
    en = F.size(F.filter(toks, lambda x: fold_col(x).isin(EN_STOPWORDS)))
    de = F.size(F.filter(toks, lambda x: fold_col(x).isin(DE_STOPWORDS)))
    return (F.when(cyrillic_ratio_col(text_col) > 0.3, F.lit("ru"))
            .when(de > en, F.lit("de"))
            .otherwise(F.lit("en")))


# ---------------------------------------------------------------------------
# PII masking
# ---------------------------------------------------------------------------
# Patterns are deliberately restricted to constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
# classes, bounded greedy quantifiers, ASCII \b — no alternation whose
# leftmost-first (Java) vs leftmost-longest (RE2) order could diverge, no
# lookaround (RE2 has none). Masking order matters (a credit card number
# contains phone-shaped digit runs): email, card, ssn, ip, then phone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "<CARD>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -]?[0-9]{0,4}\b",
     "<PHONE>"),
]


def pii_mask_col(text_col):
    """Mask emails / card numbers / SSNs / IPv4s / phone numbers with typed
    placeholder tokens — a chain of JVM ``regexp_replace`` (whole-stage
    codegen, replaces ALL occurrences), applied in ``PII_PATTERNS`` order.
    Exact SQL twin: ``sqloracles.pii_mask_sql``. Reference analogue: none;
    target-new for the training-data pipeline (pre-training corpora must be
    scrubbed at ingest, so this has to run at full-corpus scan speed)."""
    c = text_col if not isinstance(text_col, str) else \
        F.coalesce(F.col(text_col), F.lit(""))
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_count_cols(text_col: str) -> dict:
    """Per-kind match counts (pre-masking), e.g. to route high-PII docs to
    quarantine instead of masking. Counts are taken on the ORIGINAL text,
    each kind independently of the others (unlike masking, where earlier
    replacements can consume later patterns' matches — same in the SQL
    twin)."""
    t = text_col if not isinstance(text_col, str) else \
        F.coalesce(F.col(text_col), F.lit(""))
    return {f"n_{name}": F.regexp_count(t, F.lit(pat))
            for name, pat, _ in PII_PATTERNS}


def collocations_df(df, text_col: str = "text", min_count: int = 5,
                    k: int = 20, quantize: int = 4):
    """Top-``k`` bigram collocations by pointwise mutual information —
    the corpus-statistics operator behind phrase discovery / tokenizer
    vocabulary curation. PMI(a,b) = ln(p(a,b) / (p(a)p(b))) with
    p(a,b) = n_ab/total_bigrams and p(x) = n_x/total_unigrams; pairs below
    ``min_count`` are dropped (the standard guard against PMI's
    low-frequency blow-up). Returns (a, b, n_ab, pmi) ordered by
    (quantized pmi DESC, a, b).

    Scale shape: bigrams come from a narrow per-doc array transform (NO
    positional self-join — adjacency is local to the token array). Every
    token emits ONE pair row (a=tok[i], b=tok[i+1], b NULL for a doc's
    last token), and a single ``rollup(a, b)`` computes bigram counts,
    unigram counts, AND the token total in ONE shuffle (Expand + partial
    hash agg) — a naive three-branch plan re-tokenizes the corpus three
    times because Catalyst does not share subplans across DataFrame
    branches. The rollup output (the corpus n-gram statistics table,
    distinct-bigram-sized, NOT corpus-sized) is materialized with
    ``localCheckpoint`` — NOT ``persist``: the unigram table joins the
    bigram table twice (a self-join over the same derivation), and
    Spark's DeduplicateRelations re-aliases the extra references BEFORE
    cache substitution, so a merely-persisted cube is re-derived from the
    corpus on every branch but one (verified in the physical plan;
    checkpoint truncates lineage so every reference scans the
    materialized RDD). On a real cluster the durable version of this is
    writing the stats table out — localCheckpoint trades executor-loss
    tolerance for zero I/O, the right call for an intra-job temp. All
    JVM expressions, whole-stage codegen.
    """
    toks = F.transform(tokens_col(text_col),
                       lambda x: F.translate(x, UPPER, LOWER))
    # explode the position (cheap int), derive (a, b) per emitted row —
    # never explode a transform-built struct array (the dsir.py lesson)
    pairs = (df.select(toks.alias("toks"))
             .filter(F.size("toks") >= 1)
             .select("toks",
                     F.explode(F.expr("sequence(1, size(toks))"))
                     .alias("i"))
             .select(F.expr("toks[i - 1]").alias("a"),
                     F.expr("CASE WHEN i < size(toks) THEN toks[i] END")
                     .alias("b")))
    # gid: 0 = (a, b) group, 1 = (a) group, 3 = grand total. A (a, NULL)
    # group at gid=0 is a real last-token row, not a rollup margin.
    # Sub-min_count bigram rows are dropped BEFORE the checkpoint: they are
    # the long tail (most distinct bigrams are hapaxes) and nothing below
    # reads them — the unigram (gid=1), grand-total (gid=3) and b-NULL
    # last-token rows all survive, so every downstream statistic is
    # unchanged while the materialized table shrinks ~10x.
    cube = (pairs.rollup("a", "b")
            .agg(F.count("*").alias("n"), F.grouping_id().alias("gid"))
            .filter(~((F.col("gid") == 0) & F.col("b").isNotNull()
                      & (F.col("n") < min_count)))
            .localCheckpoint(eager=True))
    uni = cube.filter(F.col("gid") == 1).select("a", F.col("n").alias("n_u"))
    big = (cube.filter((F.col("gid") == 0) & F.col("b").isNotNull()
                       & (F.col("n") >= min_count))
           .select("a", "b", F.col("n").alias("n_ab")))
    # u_total = all tokens; bigram total = tokens minus each doc's last
    # token (the b-NULL rows) — both fall out of the same rollup
    totals = (cube.groupBy()
              .agg(F.sum(F.when(F.col("gid") == 3, F.col("n"))).alias("u"),
                   F.sum(F.when((F.col("gid") == 0) & F.col("b").isNull(),
                                F.col("n"))).alias("nlast"))
              .select(F.col("u").cast("double").alias("u"),
                      (F.col("u") - F.col("nlast")).cast("double")
                      .alias("bg")))
    ua = uni.select(F.col("a"), F.col("n_u").alias("n_a"))
    ub = uni.select(F.col("a").alias("b"), F.col("n_u").alias("n_b"))
    j = (big.join(ua, "a").join(ub, "b")
         .crossJoin(F.broadcast(totals)))
    num = (F.col("n_ab").cast("double") * F.col("u") * F.col("u"))
    den = (F.col("bg") * F.col("n_a").cast("double")
           * F.col("n_b").cast("double"))
    mul = float(10 ** quantize)
    pmi = F.floor(F.log(num / den) * mul) / mul
    return (j.select("a", "b", "n_ab", pmi.alias("pmi"))
            .orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
            .limit(k))


def _segmented_fold(id_col: str, nt_in: str, nt_out: str, out_col: str,
                    mul: float, normalize: bool = True):
    """mapInPandas kernel factory: exact left-to-right segmented fold of
    column ``s`` over runs of equal ``id_col`` (each run contiguous within
    the partition, possibly spanning Arrow batches), emitting one
    (id, nt, floor(acc / nt * mul) / mul) row per run.

    Vectorized WITHOUT changing a single rounding step: ``np.add.reduceat``
    / ``np.add.reduce`` use pairwise summation for float64 (verified on
    numpy 1.26 — they do NOT reproduce a sequential fold), so instead the
    fold is TRANSPOSED: one vectorized elementwise add per fold STEP across
    all of the batch's segments (segments sorted by length descending so
    the active set is a contiguous prefix). Each segment's accumulator
    still receives its addends strictly one at a time, left to right —
    bit-identical to the per-row loop it replaces (property-tested), at
    ~rows/max_run_length of the interpreter iterations. The cross-batch
    carry seeds the first segment's accumulator when a run spans batches,
    preserving ``((acc + s_i) + s_{i+1}) ...`` association exactly.

    ``normalize=False`` emits ``floor(acc * mul) / mul`` (a raw sum — the
    DSIR logw contract) instead of the mean ``floor(acc / nt * mul) / mul``.
    """

    def _emit_scalar(acc, nt):
        a = acc / nt if normalize else acc
        return np.floor(a * mul) / mul

    def _emit_vec(accs, nts):
        a = accs / nts if normalize else accs
        return np.floor(a * mul) / mul

    def fold(batches):
        cur = None
        acc = 0.0
        nt = 0
        ids: list = []
        nts: list = []
        surs: list = []

        def flush():
            out = pd.DataFrame({
                id_col: pd.array(ids, dtype="int64"),
                nt_out: pd.array(nts, dtype="int64"),
                out_col: pd.array(surs, dtype="float64")})
            ids.clear()
            nts.clear()
            surs.clear()
            return out

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            dv = pdf[id_col].to_numpy()
            sv = pdf["s"].to_numpy()
            nv = pdf[nt_in].to_numpy()
            starts = np.concatenate(
                ([0], np.flatnonzero(dv[1:] != dv[:-1]) + 1))
            lens = np.diff(np.append(starts, n))
            accs = np.zeros(len(starts))
            cont = cur is not None and dv[0] == cur
            if cur is not None and not cont:
                ids.append(cur)
                nts.append(nt)
                surs.append(_emit_scalar(acc, nt))
            if cont:
                accs[0] = acc   # resume the spanning run's fold mid-stream
            order = np.argsort(-lens, kind="stable")
            st_o, acc_o = starts[order], accs[order]
            neg_len = -lens[order]
            for i in range(int(lens[order[0]])):
                # m = #segments still active at step i (length > i)
                m = int(np.searchsorted(neg_len, -(i + 1), side="right"))
                acc_o[:m] += sv[st_o[:m] + i]
            accs[order] = acc_o
            if len(starts) > 1:
                done = starts[:-1]
                ids.extend(dv[done].tolist())
                nts.extend(nv[done].tolist())
                surs.extend(_emit_vec(accs[:-1], nv[done]).tolist())
            cur = int(dv[starts[-1]])
            nt = int(nv[starts[-1]])
            acc = float(accs[-1])
            if len(ids) >= 50_000:
                yield flush()
        if cur is not None:
            ids.append(cur)
            nts.append(nt)
            surs.append(_emit_scalar(acc, nt))
        yield flush()

    return fold


def unigram_surprisal_df(df, id_col: str = "doc_id",
                         text_col: str = "text", quantize: int = 4,
                         broadcast_vocab: bool = True):
    """Per-document mean token surprisal under the corpus unigram model:
    ``-(1/ntok) * sum_t tf_t * ln(n_t / T)`` — the CCNet/C4-style
    language-model quality signal (rare-token-heavy docs score high,
    boilerplate scores low) with the corpus itself as the model. Returns
    (``id_col``, ntok, surprisal) for docs with >= 1 token; ``id_col``
    must be unique per row (a document id).

    Float determinism: per-doc contributions are summed in ascending term
    order with a strict left-to-right fold, exactly reproducing the DuckDB
    oracle's ordered list_reduce — the same discipline as the BM25
    kernels. The order comes for FREE from the plan: per-doc (term, tf)
    pairs are run-length-encoded from the doc's SORTED token array, and
    narrow operators (explode, broadcast join, projection) preserve
    row order within a partition, so the fold kernel sees each doc's
    contributions contiguous and already term-ascending.

    Scale shape (r2 rewrite: the old plan persisted a corpus-postings-
    sized tf table and shuffled 14M (term, s) structs through a
    collect_list — correct, but its executor-memory footprint made the
    in-suite time 3-4x the isolated time): now ZERO wide shuffles on the
    scoring path and nothing persisted.
      1. frequency pass: one tokenize, explode, partial-combined hash agg
         -> vocab-sized (t, n) table (the only shuffle, vocab-sized).
      2. scoring pass: one tokenize, per-doc RLE over array_sort(toks)
         (JVM higher-order functions, narrow), explode to (doc, ntok, t,
         tf) rows, BROADCAST-join the frequency table, compute
         s = tf * -ln(n/T) JVM-side (bit-parity with the oracle's ln),
         then ONE streaming Arrow pass does the exact segmented fold —
         rows never move, state carries across Arrow batches within a
         partition.
    ``broadcast_vocab=False`` switches step 2 to a shuffle join +
    repartition(id)+sortWithinPartitions(id, t) before the same fold —
    the web-scale path when the vocabulary (~1e8+ terms at 10^12 docs)
    outgrows a broadcast; same bits, one extra shuffle (tested).
    """
    toks = F.transform(tokens_col(text_col),
                       lambda x: F.translate(x, UPPER, LOWER))
    base = (df.select(F.col(id_col), toks.alias("toks"))
            .filter(F.size("toks") >= 1))
    # vocab-sized, materialized ONCE: both the broadcast side and the
    # 1-row total derive from it (without the checkpoint, Catalyst
    # re-derives the aggregate — a whole extra corpus tokenize pass —
    # for the ``total`` branch; checkpointing 10k-100M (t, n) rows is
    # cheap, unlike the r2 shape's corpus-postings-sized persist)
    freq = (base.select(F.explode("toks").alias("t"))
            .groupBy("t").agg(F.count("*").alias("n"))
            .localCheckpoint(eager=True))
    total = freq.agg(F.sum("n").alias("tt")).select(
        F.col("tt").cast("double").alias("tt"))
    # per-doc RLE: starts = 1-based positions where a new term begins in
    # the sorted array; tf = next start - start (CASE guards the ANSI
    # out-of-bounds element_at on the last run)
    rle = base.select(
        F.col(id_col), F.size("toks").alias("ntok"),
        F.expr("array_sort(toks)").alias("st")
    ).select(
        id_col, "ntok", "st",
        F.expr("filter(sequence(1, size(st)), i -> i = 1 OR "
               "element_at(st, i) != element_at(st, i - 1))")
        .alias("starts"))
    # explode the run INDEX (cheap) and derive (t, tf) per emitted row —
    # exploding the transform-built struct array makes GenerateExec
    # re-evaluate the whole transform per emitted element (the dsir.py
    # lesson); Generate emits in array order, so the fold still sees each
    # doc contiguous and term-ascending
    pairs = rle.select(
        id_col, "ntok", "st", "starts",
        F.explode(F.expr("sequence(1, size(starts))")).alias("j")
    ).select(
        id_col, "ntok",
        F.expr("element_at(st, element_at(starts, j))").alias("t"),
        F.expr("(CASE WHEN j < size(starts) THEN element_at(starts, j + 1)"
               " ELSE size(st) + 1 END) - element_at(starts, j)")
        .alias("tf"))
    s = (F.col("tf").cast("double")
         * -F.log(F.col("n").cast("double") / F.col("tt")))
    if broadcast_vocab:
        scored = (pairs.join(F.broadcast(freq), "t")
                  .crossJoin(F.broadcast(total))
                  .select(id_col, "ntok", s.alias("s")))
    else:
        scored = (pairs.join(freq, "t")
                  .crossJoin(F.broadcast(total))
                  .select(id_col, "ntok", "t", s.alias("s"))
                  .repartition(F.col(id_col))
                  .sortWithinPartitions(id_col, "t")
                  .select(id_col, "ntok", "s"))
    mul = float(10 ** quantize)
    # exact left-to-right segmented fold, transposed-vectorized
    # (bit-identical to a per-row loop — see _segmented_fold)
    return scored.mapInPandas(
        _segmented_fold(id_col, "ntok", "ntok", "surprisal", mul),
        f"{id_col} long, ntok long, surprisal double")


def bigram_surprisal_df(df, id_col: str = "doc_id",
                        text_col: str = "text", quantize: int = 4):
    """Per-document mean CONDITIONAL bigram surprisal under the corpus
    bigram LM: ``-(1/(ntok-1)) * sum_i ln( c(w_{i-1} w_i) / c1(w_{i-1}) )``
    where ``c1`` counts the prefix token over bigram-prefix positions —
    a proper conditional distribution with no smoothing needed (every
    in-corpus bigram has count >= 1). The context-aware upgrade of
    ``unigram_surprisal_df``: word salad scores high even when its
    unigrams are common; boilerplate scores near zero. Returns
    (id_col, nbg, surprisal2) for docs with >= 2 tokens, nbg = ntok - 1.

    Float determinism: per-doc contributions fold strictly left-to-right
    in ascending (a, b) bigram order — the DuckDB twin's
    ``list_reduce(list(s ORDER BY a, b))``; binary string collation on
    both engines, space-free tokens, so the orders agree exactly.

    Scale shape (the bigram table is corpus-token-scale — it can NEVER
    broadcast, unlike the unigram vocab, so this is the engine's
    reference SHUFFLE-JOIN scoring path):
      1. per-doc (a, b, tf) rows by RLE over the sorted bigram-struct
         array, positions exploded (narrow — the Generate discipline);
      2. bigram counts = ONE map-combinable hash agg of those rows;
         prefix counts derive the same way (vocab-sized, broadcast);
      3. score rows via the bigram equi-join (AQE handles boilerplate
         skew), repartition(``id_col``) + sortWithinPartitions(id, a, b),
         then the same streaming Arrow segmented fold as the unigram
         operator — state crosses batch boundaries, rows never move
         again.
    """
    toks = F.transform(tokens_col(text_col),
                       lambda x: F.translate(x, UPPER, LOWER))
    base = (df.select(F.col(id_col), toks.alias("toks"))
            .filter(F.size("toks") >= 2))
    # per-doc sorted bigram structs -> RLE -> explode run index (cheap)
    rle = base.select(
        F.col(id_col), (F.size("toks") - 1).alias("nbg"),
        F.expr("array_sort(transform(sequence(1, size(toks) - 1), "
               "i -> struct(toks[i - 1] AS a, toks[i] AS b)))").alias("sb")
    ).select(
        id_col, "nbg", "sb",
        F.expr("filter(sequence(1, size(sb)), i -> i = 1 OR "
               "element_at(sb, i) != element_at(sb, i - 1))")
        .alias("starts"))
    pairs = rle.select(
        id_col, "nbg", "sb", "starts",
        F.explode(F.expr("sequence(1, size(starts))")).alias("j")
    ).select(
        id_col, "nbg",
        F.expr("element_at(sb, element_at(starts, j)).a").alias("a"),
        F.expr("element_at(sb, element_at(starts, j)).b").alias("b"),
        F.expr("(CASE WHEN j < size(starts) THEN element_at(starts, j + 1)"
               " ELSE size(sb) + 1 END) - element_at(starts, j)")
        .alias("tf"))
    # corpus model: bigram counts (the big table) + prefix counts (vocab)
    bgf = (pairs.groupBy("a", "b").agg(F.sum("tf").alias("nb"))
           .localCheckpoint(eager=True))
    pf = bgf.groupBy("a").agg(F.sum("nb").alias("na"))
    s = (F.col("tf").cast("double")
         * -F.log(F.col("nb").cast("double") / F.col("na").cast("double")))
    scored = (pairs.join(bgf, ["a", "b"])
              .join(F.broadcast(pf), "a")
              .select(id_col, "nbg", "a", "b", s.alias("s"))
              .repartition(F.col(id_col))
              .sortWithinPartitions(id_col, "a", "b")
              .select(id_col, F.col("nbg").alias("ntok"), "s"))
    mul = float(10 ** quantize)
    # same transposed-vectorized segmented fold as unigram_surprisal_df
    return scored.mapInPandas(
        _segmented_fold(id_col, "ntok", "nbg", "surprisal2", mul),
        f"{id_col} long, nbg long, surprisal2 double")


def quality_tiers_df(df, id_col: str = "doc_id", text_col: str = "text",
                     quantize: int = 4,
                     labels: tuple = ("head", "middle", "tail")):
    """CCNet-style quality bucketing: docs split into three equal-mass
    tiers by corpus-LM surprisal (CCNet Wenzek et al. 2020 buckets by
    LM perplexity percentile; the corpus unigram model stands in here,
    same discipline as ``unigram_surprisal_df``). ``head`` = lowest
    surprisal third (most-fluent / most-common-token docs), ``tail`` =
    highest. Returns (id_col, ntok, surprisal, tier).

    Tie contract: all docs sharing one quantized surprisal value land in
    the SAME tier (the boundary value is pulled into the lower tier), so
    the assignment is partition- and order-invariant — unlike ``ntile``,
    which splits ties by arbitrary row rank and cannot be reproduced
    across engines.

    Scale shape (why NOT a global ntile window): a corpus-sized sort
    through one reducer dies at 10^12 docs. Instead:
      1. per-doc surprisal (zero-wide-shuffle plan above), checkpointed —
         docs-sized, 3 columns; at real scale this is the quality table
         you persist anyway;
      2. histogram on the QUANTIZED value: one hash agg down to at most
         10^(quantize)-ish distinct doubles — tiny;
      3. exact CDF + tier boundaries on the histogram (single-partition
         window over the tiny table — the only non-parallel step, bounded
         by the value space, never by the corpus);
      4. boundaries broadcast back; per-doc tagging is narrow.
    """
    from pyspark.sql.window import Window

    su = unigram_surprisal_df(df, id_col, text_col, quantize)
    # docs-sized (3 cols/doc): without the checkpoint the whole surprisal
    # plan (2 tokenize passes + fold) runs once per downstream branch
    su = su.localCheckpoint(eager=True)
    hist = su.groupBy("surprisal").agg(F.count("*").alias("c"))
    w = (Window.orderBy("surprisal")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.select("surprisal", F.sum("c").over(w).alias("cum"))
    dtot = hist.agg(F.sum("c").alias("n"))
    bounds = (cum.crossJoin(F.broadcast(dtot))
              .agg(F.min(F.when(F.col("cum") * 3 >= F.col("n"),
                                F.col("surprisal"))).alias("t1"),
                   F.min(F.when(F.col("cum") * 3 >= 2 * F.col("n"),
                                F.col("surprisal"))).alias("t2")))
    tier = (F.when(F.col("surprisal") <= F.col("t1"), F.lit(labels[0]))
            .when(F.col("surprisal") <= F.col("t2"), F.lit(labels[1]))
            .otherwise(F.lit(labels[2])))
    return (su.crossJoin(F.broadcast(bounds))
            .select(id_col, "ntok", "surprisal", tier.alias("tier")))


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style repetitious-text filters)
# ---------------------------------------------------------------------------

def _run_dup_chars(arr):
    """Total length of elements of SORTED array ``arr`` whose value occurs
    more than once (each occurrence counted): an element is part of a
    duplicate run iff it equals its sorted neighbor — O(n), no nested
    re-scan of the array."""
    n = F.size(arr)
    idx = F.when(n > 0, F.sequence(F.lit(1), n)) \
           .otherwise(F.array().cast("array<int>"))
    return F.aggregate(
        idx, F.lit(0).cast("long"),
        lambda acc, i: acc + F.when(
            ((i > 1) & (F.element_at(arr, i) == F.element_at(arr, i - 1)))
            | ((i < n) & (F.element_at(arr, i) == F.element_at(arr, i + 1))),
            F.length(F.element_at(arr, i))).otherwise(F.lit(0)))


def _run_distinct_count(arr):
    """Distinct-value count of SORTED array ``arr`` = number of run starts."""
    n = F.size(arr)
    idx = F.when(n > 0, F.sequence(F.lit(1), n)) \
           .otherwise(F.array().cast("array<int>"))
    return F.aggregate(
        idx, F.lit(0).cast("long"),
        lambda acc, i: acc + F.when(
            (i == 1) | (F.element_at(arr, i) != F.element_at(arr, i - 1)),
            F.lit(1)).otherwise(F.lit(0)))


def _run_max_cover(arr):
    """max over distinct values v of count(v) * length(v) for SORTED
    ``arr`` — one linear fold carrying (best, current_run_length)."""
    n = F.size(arr)
    idx = F.when(n > 0, F.sequence(F.lit(1), n)) \
           .otherwise(F.array().cast("array<int>"))
    init = F.struct(F.lit(0).cast("long").alias("best"),
                    F.lit(0).cast("long").alias("run"))
    def merge(acc, i):
        prev_cover = acc["run"] * F.length(F.element_at(arr, i - 1))
        return (F.when(i == 1,
                       F.struct(F.lit(0).cast("long").alias("best"),
                                F.lit(1).cast("long").alias("run")))
                 .when(F.element_at(arr, i) == F.element_at(arr, i - 1),
                       F.struct(acc["best"].alias("best"),
                                (acc["run"] + 1).alias("run")))
                 .otherwise(F.struct(
                     F.greatest(acc["best"], prev_cover).alias("best"),
                     F.lit(1).cast("long").alias("run"))))
    def finish(acc):
        return F.when(n > 0, F.greatest(
            acc["best"], acc["run"] * F.length(F.element_at(arr, n)))) \
                .otherwise(F.lit(0).cast("long"))
    return F.aggregate(idx, init, merge, finish)


def _q6(x):
    # floor-quantize to 6 decimals: floor is exact on IEEE doubles, so the
    # DuckDB twin (floor(x*1e6)/1e6) matches bit-for-bit — round()
    # tie-breaking is engine-dependent (the tx_quality precedent)
    return F.floor(x * 1e6) / F.lit(1e6)


def repetition_df(df, text_col: str = "text", drop_temp: bool = True):
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1's repetition filters) —
    the standard quality gate for machine-generated / boilerplate-heavy web
    text. Appends four [0,1] double columns:

    - ``dup_line_frac``: fraction of non-empty lines that are repeats of
      another line (1 - distinct/total).
    - ``dup_line_char_frac``: fraction of line characters sitting in lines
      that occur more than once.
    - ``top2gram_char_frac``: characters covered by the most frequent word
      2-gram, over total 2-gram occurrence characters.
    - ``dup5gram_frac``: fraction of word 5-gram positions whose content
      occurs more than once in the doc.

    Lines are split on '\\n' and compared after ASCII-fold + space-trim;
    grams are built from ASCII-folded whitespace tokens — the same
    primitives as every other operator here, so the DuckDB oracle twins
    are exact (definitional dict-counting SQL; values are
    algorithm-independent).

    Plan craft: zero shuffle (rows never leave their scan partition), and
    every array is materialized ONCE per row in a staged projection, then
    duplicate runs are found by sorted-neighbor comparison and one linear
    fold — naive nested-lambda counting re-evaluates the array expression
    per lambda invocation (no common-subexpression elimination inside
    lambda bodies; measured 100 ms/doc vs ~1 ms/doc for this shape).
    Fractions are floor-quantized to 6 decimals. Reference analogue: none
    (target-new training-data op)."""
    t = fold_col(F.coalesce(F.col(text_col), F.lit("")))
    s1 = df.withColumn("_rt", t)
    lines = F.filter(F.transform(F.split(F.col("_rt"), "\\n"),
                                 lambda ln: F.trim(ln)),
                     lambda ln: ln != F.lit(""))
    toks = F.filter(F.split(F.col("_rt"), WS_RE), lambda x: x != F.lit(""))
    s2 = s1.withColumns({"_lines": F.array_sort(lines), "_toks": toks})

    ntok = F.size(F.col("_toks"))
    def _grams(n: int):
        return F.when(
            ntok >= n,
            F.array_sort(F.transform(
                F.sequence(F.lit(1), ntok - (n - 1)),
                lambda i: F.array_join(F.slice(F.col("_toks"), i, n), " ")))
        ).otherwise(F.array().cast("array<string>"))
    s3 = s2.withColumns({"_g2": _grams(2), "_g5": _grams(5)})

    ls, g2, g5 = F.col("_lines"), F.col("_g2"), F.col("_g5")
    n_lines, n2, n5 = F.size(ls), F.size(g2), F.size(g5)
    line_chars = F.aggregate(ls, F.lit(0).cast("long"),
                             lambda acc, ln: acc + F.length(ln))
    g2_chars = F.aggregate(g2, F.lit(0).cast("long"),
                           lambda acc, g: acc + F.length(g))
    out = s3.withColumns({
        "dup_line_frac": F.when(
            n_lines > 0,
            _q6(1.0 - _run_distinct_count(ls).cast("double")
                / n_lines.cast("double"))).otherwise(F.lit(0.0)),
        "dup_line_char_frac": F.when(
            line_chars > 0,
            _q6(_run_dup_chars(ls).cast("double")
                / line_chars.cast("double"))).otherwise(F.lit(0.0)),
        "top2gram_char_frac": F.when(
            g2_chars > 0,
            _q6(_run_max_cover(g2).cast("double")
                / g2_chars.cast("double"))).otherwise(F.lit(0.0)),
        "dup5gram_frac": F.when(
            n5 > 0,
            _q6(1.0 - _run_distinct_count(g5).cast("double")
                / n5.cast("double"))).otherwise(F.lit(0.0)),
    })
    return out.drop("_rt", "_lines", "_toks", "_g2", "_g5") if drop_temp \
        else out


def gopher_quality_df(df, text_col: str = "text", drop_temp: bool = True):
    """The non-repetition Gopher quality filters (Rae et al. 2021 Table A1;
    the repetition half lives in ``repetition_df``). Appends:

    - ``n_words``: whitespace token count.
    - ``mean_word_len``: mean token length (chars), 6-dp floor-quantized.
    - ``alpha_word_frac``: fraction of words containing at least one
      ASCII letter (Gopher requires >= 0.8).
    - ``symbol_word_ratio``: (count of '#' chars + count of '...'/'…'
      occurrences) / words (Gopher rejects > 0.1).
    - ``bullet_line_frac``: fraction of non-empty lines starting with a
      bullet marker ('-', '*', or U+2022 followed by space or
      end-of-line; Gopher rejects > 0.9).
    - ``ellipsis_line_frac``: fraction of non-empty lines ending with
      '...' or U+2026 (Gopher rejects > 0.3).

    Zero-shuffle staged projection (arrays built once per row; counting
    via length-difference regexp_replace, no per-element lambdas where a
    regexp suffices). Fractions are floor-quantized to 6 decimals so the
    DuckDB twin matches bit-for-bit. Reference analogue: none
    (target-new training-data op)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    s1 = df.withColumns({
        "_toks": F.filter(F.split(t, WS_RE), lambda x: x != F.lit("")),
        "_lines": F.filter(F.transform(F.split(t, "\n"),
                                       lambda ln: F.trim(ln)),
                           lambda ln: ln != F.lit("")),
    })
    toks, lines = F.col("_toks"), F.col("_lines")
    nw, nl = F.size(toks), F.size(lines)
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"),
                            lambda acc, x: acc + F.length(x))
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    # count '…' plus non-overlapping '\.\.\.' occurrences via replace-diff
    n_uell = F.length(t) - F.length(F.regexp_replace(t, "…", ""))
    n_dots = (F.length(t)
              - F.length(F.regexp_replace(t, "\\.\\.\\.", ""))) / F.lit(3)
    bullet_lines = F.size(F.filter(
        lines, lambda ln: ln.rlike("^[-*•]( |$)")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda ln: ln.rlike("(\\.\\.\\.|…)$")))
    out = s1.withColumns({
        "n_words": nw.cast("long"),
        "mean_word_len": F.when(
            nw > 0, _q6(tok_chars.cast("double") / nw.cast("double")))
            .otherwise(F.lit(0.0)),
        "alpha_word_frac": F.when(
            nw > 0, _q6(alpha_words.cast("double") / nw.cast("double")))
            .otherwise(F.lit(0.0)),
        "symbol_word_ratio": F.when(
            nw > 0, _q6((n_hash + n_uell + n_dots).cast("double")
                        / nw.cast("double"))).otherwise(F.lit(0.0)),
        "bullet_line_frac": F.when(
            nl > 0, _q6(bullet_lines.cast("double") / nl.cast("double")))
            .otherwise(F.lit(0.0)),
        "ellipsis_line_frac": F.when(
            nl > 0, _q6(ellipsis_lines.cast("double") / nl.cast("double")))
            .otherwise(F.lit(0.0)),
    })
    return out.drop("_toks", "_lines") if drop_temp else out


def c4_filters_df(df, text_col: str = "text",
                  min_words_per_line: int = 3, min_sentences: int = 5,
                  badwords: list[str] | None = None,
                  drop_temp: bool = True):
    """The C4 cleaning rules (Raffel et al. 2020 §2.2 — the pipeline that
    produced the C4 corpus), as a REWRITE + VERDICT op. Appends:

    - ``c4_text``: the page with only the RETAINED lines (trimmed lines
      that end in a terminal punctuation mark ``. ! ? "``, contain at
      least ``min_words_per_line`` whitespace words, and do not mention
      'javascript' case-insensitively), joined by newlines.
    - ``c4_kept_lines``: retained-line count.
    - ``c4_n_sentences``: sentence count of the retained text (number of
      ``. ! ?`` marks — the deterministic stand-in for C4's sentence
      splitter, twinnable bit-for-bit in SQL).
    - ``c4_has_lorem`` / ``c4_has_brace``: page-level 'lorem ipsum' /
      '{' detectors (C4 drops such pages wholesale: placeholder text and
      code respectively).
    - ``c4_badword_count``: count of word tokens (split on
      ``[^a-z0-9]+`` of the lowercased page) in ``badwords`` — C4 used
      the "List of Dirty, Naughty ..." list; the list is a parameter
      here, matched at word granularity so 'assess' never trips 'ass'.
    - ``c4_keep``: the page verdict — ``c4_n_sentences >=
      min_sentences`` and no lorem/brace/badword hit.

    Zero-shuffle narrow projection, all JVM expressions (split/filter/
    rlike/length-diff counting) — at 100 TB this runs at scan speed and
    Catalyst prunes it to the text column. Reference analogue: none
    (target-new training-data op; the reference has no web-cleaning
    surface)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    bws = sorted({w.lower() for w in (badwords or [])})
    kept = F.filter(
        F.transform(F.split(t, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln.rlike('[.!?"]$')
        & (F.size(F.filter(F.split(ln, WS_RE),
                           lambda w: w != F.lit("")))
           >= F.lit(min_words_per_line))
        & ~F.contains(F.lower(ln), F.lit("javascript")))
    s1 = df.withColumn("_c4_kept", kept)
    kt = F.array_join(F.col("_c4_kept"), "\n")
    n_sent = (F.length(kt)
              - F.length(F.regexp_replace(kt, "[.!?]", ""))).cast("long")
    low = F.lower(t)
    if bws:
        bw_count = F.size(F.filter(
            F.split(low, "[^a-z0-9]+"),
            lambda w: w.isin(*bws))).cast("long")
    else:
        bw_count = F.lit(0).cast("long")
    has_lorem = F.contains(low, F.lit("lorem ipsum"))
    has_brace = F.contains(t, F.lit("{"))
    out = s1.withColumns({
        "c4_text": kt,
        "c4_kept_lines": F.size(F.col("_c4_kept")).cast("long"),
        "c4_n_sentences": n_sent,
        "c4_has_lorem": has_lorem,
        "c4_has_brace": has_brace,
        "c4_badword_count": bw_count,
        "c4_keep": ((n_sent >= F.lit(min_sentences)) & ~has_lorem
                    & ~has_brace & (bw_count == 0)),
    })
    return out.drop("_c4_kept") if drop_temp else out
