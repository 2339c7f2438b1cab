"""Passage chunking with token overlap — the RAG / context-window prep
step: split each document into fixed-size token windows that overlap by
``overlap`` tokens, so no span of up to ``overlap`` tokens is ever cut by
a chunk boundary (LangChain/LlamaIndex token splitters, the standard
retrieval-corpus shape in front of an embedding index).

Contract (deterministic, engine-replicable):

- tokens are the engine's whitespace tokens (``textops.WS_RE``, empties
  dropped) — the same stream the index analyzer sees;
- stride = size - overlap (must be >= 1); chunk i covers tokens
  [i*stride, i*stride + size);
- n_chunks = 1 + ceil((n_tokens - size) / stride) for n_tokens > size,
  else 1 — the final chunk may be short but always reaches the last
  token, and no chunk starts at-or-past the end;
- docs with ZERO tokens yield no chunks (there is nothing to retrieve);
- chunk_text re-joins the window's tokens with single spaces
  (whitespace is normalized, exactly what the tokenizer keyed on).

100 TB shape: one narrow pass — split, a `sequence` explode of the
chunk INDEX (a cheap scalar; the slice/join runs on the emitted row, the
Generate-re-evaluation rule), zero shuffles, whole-stage codegen
throughout. Chunks-per-doc is (doc_len/stride)-bounded, so output size
is a constant factor of input size regardless of corpus scale.

Reference analogue: none (fates indexes whole records, ``lib/fates.rb``);
target-new per the survey's LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textops import WS_RE

__all__ = ["chunk_docs", "chunk_docs_sql"]


def _validate(size: int, overlap: int) -> int:
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(
            f"overlap must be in [0, size), got {overlap} for size {size}")
    return size - overlap


def chunk_docs(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", size: int = 128,
               overlap: int = 32) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, n_tokens, chunk_text) — one row
    per token window, ordered within a doc by chunk_idx (chunk_start =
    chunk_idx * stride, in tokens)."""
    stride = _validate(size, overlap)
    toks = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), WS_RE),
                    lambda x: x != F.lit(""))
    n = F.size(F.col("_toks"))
    # integer ceil-div (Spark `div` == DuckDB `//` on non-negatives, the
    # PageRank precedent) — no float round-trip in the chunk count
    n_chunks = F.when(n <= size,
                      F.when(n > 0, F.lit(1)).otherwise(F.lit(0))) \
        .otherwise(F.lit(1) + F.expr(
            f"(size(_toks) - {size} + {stride - 1}) div {stride}")
            .cast("int"))
    # sequence(0, -1) would auto-step DOWN in Spark; empty docs must
    # explode to zero rows, so gate the sequence on n_chunks > 0
    seq = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)) \
        .otherwise(F.array().cast("array<int>"))
    out = (docs
           .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
           .select("doc_id", "_toks",
                   F.explode(seq).alias("chunk_idx"))
           .select("doc_id",
                   F.col("chunk_idx").cast("int").alias("chunk_idx"),
                   (F.col("chunk_idx") * stride).cast("int")
                   .alias("chunk_start"),
                   F.slice(F.col("_toks"),
                           F.col("chunk_idx") * stride + 1,
                           size).alias("_win"))
           .select("doc_id", "chunk_idx", "chunk_start",
                   F.size("_win").cast("int").alias("n_tokens"),
                   F.array_join("_win", " ").alias("chunk_text")))
    return out


def chunk_docs_sql(src: str, size: int = 128, overlap: int = 32,
                   text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin: same tokens, same window rule, same single-space
    re-join — hash-exact against ``chunk_docs``."""
    stride = _validate(size, overlap)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(regexp_split_to_array(coalesce({text_col}, ''),
                                           '{WS_RE}'),
                     t -> t <> '') AS toks
  FROM {src}
),
counted AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) = 0 THEN 0
              WHEN len(toks) <= {size} THEN 1
              ELSE 1 + CAST((len(toks) - {size} + {stride - 1})
                            // {stride} AS INT)
         END AS n_chunks
  FROM toks
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(i * {stride} AS INT) AS chunk_start,
       CAST(len(toks[i * {stride} + 1 : i * {stride} + {size}]) AS INT)
         AS n_tokens,
       array_to_string(toks[i * {stride} + 1 : i * {stride} + {size}], ' ')
         AS chunk_text
FROM counted, unnest(range(n_chunks)) AS u(i)"""
