"""Numeric range filtering via trie-encoded terms — the Lucene
``NumericRangeQuery`` / precision-step design (Schindler & Diepenbroek,
"Generic XML-based framework for metadata portals", CG&G 2008; Lucene
``NumericUtils.splitLongRange``), absent from the reference (fates matches
text suffixes only).

A non-negative integer indexes as ONE token per precision level: level
``shift`` (a multiple of ``step``) contributes ``"{shift}x{value >> shift
:x}"``. A range query ``[lo, hi]`` then expands to a MINIMAL covering set
of trie tokens — at most ``2 * 2^step`` per level — where every in-range
value matches exactly one covering token and every out-of-range value
matches none. The expansion plugs straight into the engine's
filters-as-postings IN-list restriction (``search(filter_terms=,
filter_field=)``): the filter rides the same postings scan, restricts
bucket-locally before top-k, and never joins the doc table.

Scale shape: indexing cost is ``bits/step`` extra postings per document
(8 for the 32-bit/step-4 default — constant); query cost is an IN-list of
<= ~2*16*8 = 256 dictionary terms whose doc-id streams are unioned by the
existing filter machinery. No corpus scan, no per-doc predicate at query
time — the classic trade Lucene makes for range-heavy workloads.

Token format survives the whitespace analyzer + ASCII fold unchanged
(lowercase hex, no separators the tokenizer splits on), so filter terms
pass through ``search()``'s query-side folding as-is.
"""

from __future__ import annotations

STEP = 4
BITS = 32

__all__ = ["BITS", "STEP", "numeric_trie_tokens", "search_range",
           "split_range", "trie_tokens"]


def _tok(shift: int, prefix: int) -> str:
    return f"{shift:02d}x{prefix:x}"


def trie_tokens(value: int, step: int = STEP, bits: int = BITS) -> list[str]:
    """Index-side tokens of a non-negative int: one per precision level."""
    v = int(value)
    if not 0 <= v < (1 << bits):
        raise ValueError(f"value out of range for {bits}-bit trie: {v}")
    return [_tok(s, v >> s) for s in range(0, bits, step)]


def numeric_trie_tokens(text: str) -> list[str]:
    """Analyzer protocol: each whitespace-separated decimal integer in the
    field value emits its trie tokens; non-numeric / out-of-range parts
    are skipped (the null-analyzer discipline: never raise on data)."""
    out: list[str] = []
    for part in text.split():
        # ascii-digits-only domain so the JVM doc-length twin
        # (build.doclen_col: rlike '^[0-9]+$' + try_cast bound) agrees
        # exactly — python int() would also accept '+5'/'5_0'/unicode digits
        if not (part.isascii() and part.isdigit()):
            continue
        v = int(part, 10)
        if v < (1 << BITS):
            out.extend(trie_tokens(v))
    return out


def split_range(lo: int, hi: int, step: int = STEP,
                bits: int = BITS) -> list[str]:
    """Minimal covering trie-token set for the inclusive range [lo, hi]
    (Lucene's splitRange): full-precision edge runs at each level, one
    coarser level for the aligned middle, recursing upward. The emitted
    tokens' value intervals are DISJOINT and their union is exactly
    [lo, hi] (property-fuzzed in tests)."""
    lo, hi = max(int(lo), 0), min(int(hi), (1 << bits) - 1)
    out: list[str] = []
    if lo > hi:
        return out

    def add(a: int, b: int, shift: int) -> None:
        out.extend(_tok(shift, p)
                   for p in range(a >> shift, (b >> shift) + 1))

    shift = 0
    while True:
        diff = 1 << (shift + step)
        mask = ((1 << step) - 1) << shift
        has_lower = (lo & mask) != 0
        has_upper = (hi & mask) != mask
        next_lo = (lo + diff if has_lower else lo) & ~(diff - 1)
        next_hi = (hi - diff if has_upper else hi) & ~(diff - 1)
        if shift + step >= bits or next_lo > next_hi:
            add(lo, hi, shift)
            return out
        if has_lower:
            add(lo, lo | mask, shift)
        if has_upper:
            add(hi & ~mask, hi, shift)
        lo, hi = next_lo, next_hi
        shift += step


def search_range(index, query, lo: int, hi: int, *, numeric_field: int,
                 k: int = 10, mode: str = "OR",
                 weights: list[float] | None = None, **kw):
    """Ranked search restricted to docs whose trie-indexed numeric field
    value lies in [lo, hi]: the covering expansion becomes the engine's
    index-side IN-list filter. ``weights`` defaults to scoring every field
    EXCEPT the numeric one (its trie tokens must filter, not score)."""
    if weights is None:
        weights = [0.0 if f == numeric_field else 1.0
                   for f in range(index.n_fields)]
    return index.search(query, k=k, mode=mode, weights=weights,
                        filter_terms=split_range(lo, hi),
                        filter_field=numeric_field, **kw)
