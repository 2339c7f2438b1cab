"""Distributed BPE tokenizer training (Sennrich et al. 2016, ACL).

Training a byte-pair-encoding vocabulary is the canonical "iterative
algorithm over corpus statistics" an LLM-data platform must run: repeat
``n_merges`` times { count adjacent symbol pairs over all words (weighted
by word frequency), merge the most frequent pair everywhere }.

The Spark-first insight is that after ONE corpus pass, everything runs at
VOCAB scale, not corpus scale: ``groupBy(word).count()`` collapses the
10^12-token stream to its unique-word table (map-side combinable — the
classic word-count shuffle), and every merge round then touches only that
table. At web scale the unique-whitespace-token table is ~10^7–10^9 rows
(heavy-tailed); the ``min_count`` knob prunes the hapax tail — standard
practice (a pair occurring once can never win a merge unless the whole
tail conspires; pruning at 2+ is lossless for any realistic corpus) — and
bounds the working set to low GB.

Per round: one vocab-scale pair-count aggregate (map-side combined, ~26²
to |alphabet+merges|² keys — tiny), a LIMIT-1 argmax collected to the
driver, and a NARROW fold applying the merge to each word's symbol array.
Rounds persist/unpersist alternately so lineage stays O(1) instead of the
k-deep recompute chain.

Determinism: ties on pair count break (left, right) lexicographically —
Sennrich's reference ``max(stats)`` is arbitrary under ties; this contract
is total, so the DuckDB oracle (``bpe_train_sql``, the same rounds
unrolled as CTEs over a delimiter-wrapped string encoding) reproduces the
merge table exactly. Pair counting is the reference convention (all
adjacent pairs, overlapping included: "aaa" yields (a,a) twice); merge
application is greedy left-to-right non-overlapping — both matched by the
oracle's encode/replace semantics. Symbols are built from ASCII-folded
whitespace tokens (``textops.fold_col`` — the engine's analyzer contract); the oracle's
string encoding assumes tokens don't contain chr(31) (unit separator),
which the analyzer corpus guarantees.

Reference analogue: none (fates has no tokenizer-training surface);
target-new per the survey's LLM-data ops mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import fold_col

_SEP = chr(31)  # oracle string-encoding delimiter (unit separator)


def _merge_fold(syms_col, a: str, b: str):
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) into
    a+b over a symbol array — an ordered JVM fold. A just-merged symbol
    can only chain when its full string equals ``a`` (e.g. (a,a) over
    "aaaa" -> [aa, aa]), which is exactly the reference scan."""
    return F.aggregate(
        syms_col, F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(s))))


def word_vocab(df: DataFrame, text_col: str = "text",
               min_count: int = 1) -> DataFrame:
    """(word, cnt) over ASCII-folded whitespace tokens — the ONE corpus
    pass; everything downstream is vocab-scale."""
    toks = F.filter(
        F.split(fold_col(F.coalesce(F.col(text_col), F.lit(""))),
                r"[ \t\n\r\f\v]+"),
        lambda x: x != F.lit(""))
    return (df.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= min_count))


def bpe_train(df: DataFrame, n_merges: int = 8, text_col: str = "text",
              min_count: int = 1) -> list[tuple[int, str, str, int]]:
    """Run ``n_merges`` BPE rounds; returns [(rank, left, right, freq)]
    where freq is the pair's weighted count when it was chosen. Stops
    early if no pair remains (every word down to one symbol)."""
    vocab = (word_vocab(df, text_col=text_col, min_count=min_count)
             .select(F.split("word", "").alias("syms"), "cnt")
             .persist())
    merges: list[tuple[int, str, str, int]] = []
    try:
        cur = vocab
        for rank in range(n_merges):
            pairs = F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("l"),
                    F.element_at(F.col("syms"), i + 1).alias("r")))
            top = (cur.filter(F.size("syms") >= 2)
                   .select(F.explode(pairs).alias("p"), "cnt")
                   .groupBy("p.l", "p.r").agg(F.sum("cnt").alias("c"))
                   .orderBy(F.desc("c"), "l", "r")
                   .limit(1).collect())
            if not top:
                break
            a, b, freq = top[0]["l"], top[0]["r"], int(top[0]["c"])
            merges.append((rank, a, b, freq))
            nxt = cur.select(_merge_fold(F.col("syms"), a, b).alias("syms"),
                             "cnt").persist()
            nxt.count()  # materialize before dropping the parent cache
            if cur is not vocab:
                cur.unpersist()
            cur = nxt
        if cur is not vocab:
            cur.unpersist()
    finally:
        vocab.unpersist()
    return merges


def bpe_train_df(df: DataFrame, n_merges: int = 8, text_col: str = "text",
                 min_count: int = 1) -> DataFrame:
    """``bpe_train`` as a DataFrame (rank, left, right, freq) — the
    queries() surface."""
    spark = df.sparkSession
    rows = bpe_train(df, n_merges=n_merges, text_col=text_col,
                     min_count=min_count)
    return spark.createDataFrame(
        rows, "merge_rank int, lhs string, rhs string, freq long")


def bpe_train_sql(n_merges: int = 8, table: str = "documents",
                  text_col: str = "text", min_count: int = 1) -> str:
    """DuckDB twin of ``bpe_train``: the same rounds unrolled as CTEs.

    Words are encoded as delimiter-wrapped symbol strings
    (``<US>sym<US><US>sym<US>...``), so applying a merge is one
    non-overlapping left-to-right ``replace()`` — exactly the engine's
    greedy fold — and splitting on the double delimiter recovers the
    symbol list for the next round's pair counts."""
    up = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    lo = "abcdefghijklmnopqrstuvwxyz"
    ws = r"[ \t\n\r\f\v]+"
    s = "chr(31)"
    ctes = [f"""w AS (
  SELECT t AS word, count(*)::BIGINT AS cnt
  FROM (SELECT unnest(regexp_split_to_array(
                 translate(coalesce({text_col}, ''), '{up}', '{lo}'),
                 '{ws}')) AS t
        FROM {table})
  WHERE t <> '' GROUP BY t
  HAVING count(*) >= {min_count}
),
v0 AS (
  SELECT list_reduce(list_transform(string_split(word, ''),
                                    ch -> {s} || ch || {s}),
                     (x, y) -> x || y) AS enc,
         cnt
  FROM w
)"""]
    for r in range(1, n_merges + 1):
        ctes.append(f"""p{r} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r2, sum(cnt)::BIGINT AS c
  FROM (SELECT string_split(trim(enc, {s}), {s} || {s}) AS syms, cnt
        FROM v{r - 1} WHERE len(trim(enc, {s})) > 0),
       unnest(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2
),
m{r} AS (
  SELECT {r - 1} AS merge_rank, l, r2, c FROM p{r}
  ORDER BY c DESC, l, r2 LIMIT 1
),
v{r} AS (
  SELECT CASE WHEN m.l IS NULL THEN v.enc
         ELSE replace(v.enc, {s} || m.l || {s} || {s} || m.r2 || {s},
                      {s} || m.l || m.r2 || {s}) END AS enc,
         v.cnt
  FROM v{r - 1} v LEFT JOIN m{r} m ON TRUE
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT merge_rank, l AS lhs, r2 AS rhs, c AS freq FROM m{r}"
        for r in range(1, n_merges + 1))
    return ("WITH " + ",\n".join(ctes)
            + f"\n{unions}\nORDER BY merge_rank")


def _encode_word_py(word: str, merges: list[tuple[str, str]]) -> int:
    """Token count of one word under the trained merge list — each rule
    applied in RANK ORDER with the greedy left-to-right chaining fold
    (``_merge_fold`` semantics, == the training-time scan, == the SQL
    twin's delimiter replace)."""
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return len(syms)


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               broadcast_vocab: bool = True) -> DataFrame:
    """Per-doc token accounting under a TRAINED tokenizer:
    (doc_id, n_words, n_tokens) with n_tokens = sum over the doc's words
    of their BPE symbol count — the apply side of ``bpe_train`` (token
    budgets, mixture weights and packing all consume this number).

    Scale shape: each DISTINCT word is encoded exactly ONCE — the encode
    kernel (an Arrow ``mapInPandas`` pass carrying the rank-ordered merge
    list in its closure) runs over the Heaps-law-bounded distinct-word
    table, never the corpus; the corpus side is a narrow tokenize +
    explode, one join against the (word -> n_tokens) map — broadcast by
    default (real vocabs are ~10^5-10^7 rows of short strings), or a
    shuffle join via ``broadcast_vocab=False`` when the distinct-word
    table outgrows broadcast — and ONE doc_id aggregation. Encoding cost
    is O(distinct_words x merges x word_len), independent of corpus
    duplication. Docs with no words produce no row (same as the SQL
    twin's inner join).
    """
    import pandas as pd

    rules = [(str(a), str(b)) for a, b in merges]

    toks = F.filter(
        F.split(fold_col(F.coalesce(F.col(text_col), F.lit(""))),
                r"[ \t\n\r\f\v]+"),
        lambda x: x != F.lit(""))
    words = df.select(F.col(id_col), F.explode(toks).alias("word"))
    distinct = words.select("word").distinct()

    def enc(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "word": pdf["word"],
                "n_tokens": [_encode_word_py(w, rules)
                             for w in pdf["word"]]})

    wmap = distinct.mapInPandas(enc, "word string, n_tokens int")
    if broadcast_vocab:
        wmap = F.broadcast(wmap)
    return (words.join(wmap, "word")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_tokens").alias("n_tokens")))


def bpe_encode_sql(n_merges: int = 8, table: str = "documents",
                   text_col: str = "text", min_count: int = 1) -> str:
    """DuckDB twin of ``bpe_train`` + ``bpe_encode`` over the same corpus:
    the training CTEs (identical to ``bpe_train_sql``) carry the word
    through each round, then per-doc words join their final symbol count.
    """
    up = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    lo = "abcdefghijklmnopqrstuvwxyz"
    ws = r"[ \t\n\r\f\v]+"
    s = "chr(31)"
    ctes = [f"""wd AS (
  SELECT doc_id, t AS word
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(
                 translate(coalesce({text_col}, ''), '{up}', '{lo}'),
                 '{ws}')) AS t
        FROM {table})
  WHERE t <> ''
),
w AS (
  SELECT word, count(*)::BIGINT AS cnt FROM wd GROUP BY word
  HAVING count(*) >= {min_count}
),
v0 AS (
  SELECT word,
         list_reduce(list_transform(string_split(word, ''),
                                    ch -> {s} || ch || {s}),
                     (x, y) -> x || y) AS enc,
         cnt
  FROM w
)"""]
    for r in range(1, n_merges + 1):
        ctes.append(f"""p{r} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r2, sum(cnt)::BIGINT AS c
  FROM (SELECT string_split(trim(enc, {s}), {s} || {s}) AS syms, cnt
        FROM v{r - 1} WHERE len(trim(enc, {s})) > 0),
       unnest(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2
),
m{r} AS (
  SELECT {r - 1} AS merge_rank, l, r2, c FROM p{r}
  ORDER BY c DESC, l, r2 LIMIT 1
),
v{r} AS (
  SELECT v.word,
         CASE WHEN m.l IS NULL THEN v.enc
         ELSE replace(v.enc, {s} || m.l || {s} || {s} || m.r2 || {s},
                      {s} || m.l || m.r2 || {s}) END AS enc,
         v.cnt
  FROM v{r - 1} v LEFT JOIN m{r} m ON TRUE
)""")
    return ("WITH " + ",\n".join(ctes) + f""",
wtok AS (
  SELECT word,
         len(string_split(trim(enc, {s}), {s} || {s}))::INT AS n_tokens
  FROM v{n_merges}
)
SELECT wd.doc_id, count(*)::BIGINT AS n_words,
       sum(wtok.n_tokens)::BIGINT AS n_tokens
FROM wd JOIN wtok USING (word)
GROUP BY wd.doc_id ORDER BY wd.doc_id""")
