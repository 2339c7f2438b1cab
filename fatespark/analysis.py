"""Analyzers: tokenization, offsets, ASCII case folding, HTML text extraction.

Pure pandas/numpy functions — usable standalone in unit tests and wrapped in
vectorized pandas UDFs on the cluster (input_hint: "no per-row Python" in the
hot path; these are applied per Arrow batch via ``pd.Series.map`` /
``re.finditer`` which is the vectorized-batch idiom for string tokenization).

Parity notes (behavior observed in the reference, jeffrafter/fates):
- Whitespace analyzer: token starts of ``\\S+`` runs, leading whitespace
  skipped (reference ``lib/analysis/whitespace_analyzer.rb:14-21``); golden
  offsets in ``test/units/whitespace_analyzer_test.rb:9-35`` include tab, LF,
  CR and CRLF separators and a base-offset shift case.
- Identifier analyzer: token starts of ``[A-Za-z_][A-Za-z0-9_]*`` matches
  (reference ``lib/analysis/simple_identifier_analyzer.rb:15-23``); goldens in
  ``test/units/simple_identifier_analyzer_test.rb:9-33``.
- Case fold: byte-wise ASCII-only downcase (``$KCODE=''`` semantics,
  reference ``lib/comparison/comparator.rb:8-14``); UTF-8 multibyte sequences
  pass through unchanged (``test/units/comparator_test.rb:13-15``).

Whitespace is defined as the ASCII set ``[ \\t\\n\\r\\f\\v]`` explicitly (NOT
``\\s``, which in Python 3 ``str`` mode matches Unicode spaces) so Spark,
DuckDB-oracle SQL (RE2) and the pure-Python oracle agree byte-for-byte.
"""

from __future__ import annotations

import re
from typing import Iterable

ASCII_WS = " \t\n\r\f\v"
WS_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")
IDENT_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

# ASCII-only downcase table: A-Z -> a-z, everything else (incl. non-ASCII
# codepoints) untouched.
_FOLD_TABLE = {c: c + 32 for c in range(ord("A"), ord("Z") + 1)}

HTML_PREFIX = b"<html><body>"
HTML_SUFFIX = b"</body></html>"


def ascii_fold(text: str) -> str:
    """ASCII-only lowercase; non-ASCII codepoints pass through unchanged."""
    return text.translate(_FOLD_TABLE)


def whitespace_token_offsets(
    text: str, offset: int = 0, base_offset: int = 0, index: int = 0
) -> list[list[int]]:
    """Token-start triples ``[start+offset, base_offset, index]`` for ``\\S+``
    runs — signature/return parity with the reference analyzer protocol
    ``append_suffixes(array, text, offset, base_offset, index)``."""
    return [[m.start() + offset, base_offset, index] for m in WS_TOKEN_RE.finditer(text)]


def identifier_token_offsets(
    text: str, offset: int = 0, base_offset: int = 0, index: int = 0
) -> list[list[int]]:
    """Token-start triples for identifier matches ``[A-Za-z_][A-Za-z0-9_]*``."""
    return [[m.start() + offset, base_offset, index] for m in IDENT_TOKEN_RE.finditer(text)]


def whitespace_tokens(text: str) -> list[str]:
    return WS_TOKEN_RE.findall(text)


def identifier_tokens(text: str) -> list[str]:
    return IDENT_TOKEN_RE.findall(text)


def porter_tokens(text: str) -> list[str]:
    """Whitespace tokens, ASCII-folded then Porter-stemmed (north rule:
    'tokenization and stemming'). Folds internally so the output is already
    index-ready; the outer fold applied by segment build / query prep is
    idempotent over it."""
    from .stem import porter_stem
    return [porter_stem(ascii_fold(t)) for t in WS_TOKEN_RE.findall(text)]


def _numeric_trie_tokens(text: str) -> list[str]:
    from .numeric import numeric_trie_tokens
    return numeric_trie_tokens(text)


ANALYZERS = {
    "whitespace": (whitespace_tokens, whitespace_token_offsets),
    "identifier": (identifier_tokens, identifier_token_offsets),
    # stemming analyzer: same offsets as whitespace (stemming does not move
    # token starts), stemmed terms in the index/query stream
    "porter": (porter_tokens, whitespace_token_offsets),
    # numeric trie field (Lucene precision-step): a decimal integer emits
    # one token per precision level; range queries expand to a covering
    # token set (numeric.split_range) on the filters-as-postings path.
    # Offsets: whole-value offsets are meaningless for derived tokens;
    # reuse whitespace offsets for the raw parts (snippets never target
    # numeric fields).
    "numeric_trie": (_numeric_trie_tokens, whitespace_token_offsets),
}


def analyze(text: str, analyzer: str = "whitespace") -> list[str]:
    """Folded terms of ``text`` under ``analyzer`` — the index/query token
    stream. Fold-after-tokenize == tokenize-after-fold here because the ASCII
    fold never creates or destroys whitespace/identifier boundaries."""
    tok, _ = ANALYZERS[analyzer]
    return [ascii_fold(t) for t in tok(text)]


def extract_text(html: bytes) -> str:
    """Extract page text from the Common-Crawl-style ``html`` binary column.

    The fixture contract (FIXTURES.md F1) wraps the text as
    ``<html><body>{text}</body></html>``; extraction must return the payload
    byte-identically. Real-world extraction would plug in here (trafilatura
    etc. — not available in this container)."""
    body = html
    if body.startswith(HTML_PREFIX):
        body = body[len(HTML_PREFIX):]
    if body.endswith(HTML_SUFFIX):
        body = body[: -len(HTML_SUFFIX)]
    return body.decode("utf-8")


def doc_length(text: str, analyzer: str = "whitespace") -> int:
    tok, _ = ANALYZERS[analyzer]
    return len(tok(text))


def term_positions(tokens: Iterable[str]) -> dict[str, list[int]]:
    """term -> sorted token positions (0-based) — the per-doc posting payload."""
    out: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        out.setdefault(t, []).append(i)
    return out
