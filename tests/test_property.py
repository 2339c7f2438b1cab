"""Hypothesis property tests over the pure kernels — codec round-trips on
adversarial shapes, analyzer invariants, stemmer sanity, top-k total order.
(The reference has no property tests; SURVEY §5 target plan adds them.)"""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fatespark.analysis import ascii_fold, whitespace_token_offsets, \
    whitespace_tokens
from fatespark.codec import (
    delta_decode_ids,
    delta_encode_ids,
    varint_decode,
    varint_encode,
)
from fatespark.stem import porter_stem
from fatespark.wand import topk_select

u64s = st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200)


@settings(max_examples=200, deadline=None)
@given(u64s)
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a), a.size), a)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                max_size=150, unique=True))
def test_doc_id_delta_roundtrip_any_signed(ids):
    # doc lists are stored sorted in u64o (unsigned-mapped) order
    from fatespark.codec import _i64_to_u64_ordered, _u64_to_i64_ordered
    a = _u64_to_i64_ordered(np.sort(_i64_to_u64_ordered(
        np.array(ids, dtype=np.int64))))
    assert np.array_equal(delta_decode_ids(delta_encode_ids(a), a.size), a)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=300))
def test_tokenizer_invariants(text):
    toks = whitespace_tokens(text)
    offs = whitespace_token_offsets(text)
    # one offset triple per token, each pointing at its token start
    assert len(toks) == len(offs)
    for tok, (start, _, _) in zip(toks, offs):
        assert text[start:start + len(tok)] == tok
    # tokens contain no ASCII whitespace and cover all non-ws chars
    ws = set(" \t\n\r\f\v")
    assert all(not (set(t) & ws) for t in toks)
    assert sum(map(len, toks)) == sum(1 for c in text if c not in ws)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=100))
def test_fold_idempotent_and_length_preserving(text):
    f = ascii_fold(text)
    assert len(f) == len(text)
    assert ascii_fold(f) == f
    # non-ASCII untouched
    for a, b in zip(text, f):
        if ord(a) > 127:
            assert a == b


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
               max_size=30))
def test_stemmer_invariants(w):
    s = porter_stem(w)
    assert len(s) <= len(w) + 1          # +1: e-restoration (hop -> hope)
    assert s == "" or (s.isascii() and s.islower())
    if len(w) <= 2:
        assert s == w


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=-1000, max_value=1000),
                          st.floats(min_value=0, max_value=10,
                                    allow_nan=False)),
                max_size=80),
       st.integers(min_value=1, max_value=20))
def test_topk_select_is_total_order_prefix(pairs, k):
    seen = {}
    for d, s in pairs:  # unique doc ids
        seen[d] = s
    docs = np.array(list(seen), dtype=np.int64)
    scores = np.array([seen[d] for d in docs], dtype=np.float64)
    got_d, got_s = topk_select(docs, scores, k)
    want = sorted(zip(docs.tolist(), scores.tolist()),
                  key=lambda p: (-p[1], p[0]))[:k]
    assert list(zip(got_d.tolist(), got_s.tolist())) == want


# -- PFor frames (pfor.py) ---------------------------------------------------

_pfor_groups = st.lists(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1),
             min_size=1, max_size=160),
    min_size=1, max_size=12)


@given(_pfor_groups)
@settings(max_examples=60, deadline=None)
def test_pfor_grouped_roundtrip(groups):
    from fatespark.pfor import pfor_decode_concat, pfor_encode_grouped
    flat = np.array([v for g in groups for v in g], dtype=np.uint64)
    glens = np.array([len(g) for g in groups], dtype=np.int64)
    starts = np.zeros(len(groups), dtype=np.int64)
    np.cumsum(glens[:-1], out=starts[1:])
    bufs = pfor_encode_grouped(flat, starts)
    assert len(bufs) == len(groups)
    back = pfor_decode_concat(bufs, glens, int(glens.sum()))
    assert (back == flat).all()


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=500))
@settings(max_examples=60, deadline=None)
def test_pfor_single_frame_vs_varint_agree(vals):
    from fatespark.codec import get_codec
    v = np.array(vals, dtype=np.uint64)
    st0 = np.zeros(1, dtype=np.int64)
    out = {}
    for name in ("varint", "pfor"):
        c = get_codec(name)
        buf = c.encode_grouped(v, st0)[0]
        out[name] = c.decode(buf, v.size)
    assert (out["varint"] == out["pfor"]).all()
    assert (out["pfor"] == v).all()


# ---------------------------------------------------------------------------
# span-match kernel: random corpora vs a brute re-scan


def _span_data(docs_tokens):
    """Build the per-term decoded-postings dict (_decode_with_positions
    shape) directly from token lists."""
    terms = {}
    dl = {}
    for did, toks in docs_tokens:
        dl[did] = len(toks)
        for p, t in enumerate(toks):
            terms.setdefault(t, {}).setdefault(did, []).append(p)
    out = {}
    for t, m in terms.items():
        dids = sorted(m)
        tfs = np.array([len(m[d]) for d in dids], dtype=np.int64)
        out[t] = {
            "docs": np.array(dids, dtype=np.int64),
            "tfs": tfs,
            "dls": np.array([dl[d] for d in dids], dtype=np.int64),
            "poss": np.array([p for d in dids for p in m[d]],
                             dtype=np.int64),
            "tok_starts": np.concatenate(
                [np.zeros(1, dtype=np.int64), np.cumsum(tfs)]),
        }
    return out


def _brute_spans(docs_tokens, phrase, max_end=None, exclude=None,
                 pre=0, post=0):
    L = len(phrase)
    res = {}
    for did, toks in docs_tokens:
        tf = 0
        for s in range(len(toks) - L + 1):
            if toks[s:s + L] != phrase:
                continue
            e = s + L
            if max_end is not None and e > max_end:
                continue
            if exclude:
                lo, hi = max(s - pre, 0), min(e - 1 + post, len(toks) - 1)
                if any(toks[q] in exclude for q in range(lo, hi + 1)):
                    continue
            tf += 1
        if tf:
            res[did] = tf
    return res


_tok = st.sampled_from(["a", "b", "c", "x"])
_doc = st.lists(_tok, min_size=0, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(_corpus,
       st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3),
       st.one_of(st.none(), st.integers(min_value=1, max_value=10)),
       st.booleans(),
       st.integers(min_value=0, max_value=3),
       st.integers(min_value=0, max_value=3))
def test_span_kernel_matches_brute(corpus, phrase, max_end, use_exc,
                                   pre, post):
    from fatespark.query import _match_variant_rows
    docs_tokens = [(i, toks) for i, toks in enumerate(corpus)]
    data = _span_data(docs_tokens)
    exclude = ["x"] if use_exc else None
    want = _brute_spans(docs_tokens, phrase, max_end=max_end,
                        exclude=exclude, pre=pre, post=post)
    if any(t not in data for t in phrase):
        return  # kernel contract: caller pre-filters missing terms
    m = _match_variant_rows(data, list(phrase), None, max_end=max_end,
                            exclude=exclude, pre=pre, post=post)
    got = {} if m is None else dict(zip(m["doc_id"], m["tf"]))
    assert got == want


# ---------------------------------------------------------------------------
# sequence packing: the integer scan law on arbitrary id/count multisets


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=-10**6, max_value=10**6),
                          st.integers(min_value=0, max_value=500)),
                min_size=1, max_size=40,
                unique_by=lambda t: t[0]),
       st.integers(min_value=1, max_value=300))
def test_packing_law(rows, budget):
    """Pure-python law the distributed scan must satisfy (the Spark twin is
    asserted equal to brute in tests/test_packing.py): offsets are the
    exclusive prefix sum in id order, seq spans derive from integer
    division, and totals telescope."""
    rows = sorted(rows)
    run = 0
    for i, (did, n) in enumerate(rows):
        start = run
        run += n
        seq = start // budget
        last = max(start + n - 1, start)
        assert seq <= last // budget
        assert (last // budget - seq + 1) >= 1
    assert run == sum(n for _, n in rows)
