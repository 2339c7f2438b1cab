"""Deterministic synthetic corpora (FIXTURES.md F1/F2).

Everything derives from splitmix64 of (seed, row id) — no RNG state, no wall
clock, no pid (unlike the reference's ``tasks/fates.rake:9-21`` which uses
``rand``) — so generation is byte-identical regardless of Spark partitioning,
executor count, or generation order. The same vectorized numpy code path
serves local pandas tests and the cluster ``mapInPandas`` generator.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

import numpy as np
import pandas as pd

SEED = 42
EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the deterministic hash primitive."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=np.uint64) + _C1)
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def _mix(seed: int, stream: int, x: np.ndarray | int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return splitmix64(splitmix64(np.uint64(seed) * np.uint64(0x1000003) + np.uint64(stream))
                          + np.asarray(x, dtype=np.uint64))


# ---------------------------------------------------------------------------
# Vocabulary: ~10k terms, Zipf-distributed; special tokens for parity tests
# (multi-case forms, identifiers, digits, Cyrillic) placed at head/mid/tail.
# ---------------------------------------------------------------------------

_SPECIAL_HEAD = ["the", "of", "and", "to", "a", "in", "is", "for", "on", "with"]
_SPECIAL_MID = ["Smith", "smith", "Jones", "brown", "fates", "fat", "faq",
                "big", "array", "search", "index", "Muppet", "fat_entry",
                "hello_world", "test1", "test2", "42", "2026", "web", "page"]
_SPECIAL_TAIL = ["Любовная", "история", "zyzzyva", "qwertyuiop", "fatidical"]
VOCAB_SIZE = 10_000


def build_vocab() -> tuple[np.ndarray, np.ndarray]:
    """(terms, cumulative probs) — Zipf s=1.07 over rank order."""
    n_gen = VOCAB_SIZE - len(_SPECIAL_HEAD) - len(_SPECIAL_MID) - len(_SPECIAL_TAIL)
    gen = [f"term{i:05d}" for i in range(n_gen)]
    terms = (_SPECIAL_HEAD + gen[:40] + _SPECIAL_MID + gen[40:] + _SPECIAL_TAIL)
    ranks = np.arange(1, len(terms) + 1, dtype=np.float64)
    w = ranks ** -1.07
    return np.array(terms, dtype=object), np.cumsum(w / w.sum())


_VOCAB, _CUM = build_vocab()
_SEPS = np.array([" ", "\t", "\n", "\r\n"], dtype=object)
_LANGS = np.array(["en", "ru", "de"], dtype=object)


def pages_pandas(ids: np.ndarray, seed: int = SEED) -> pd.DataFrame:
    """Generate the pages rows for the given ids (vectorized)."""
    ids = np.asarray(ids, dtype=np.uint64)
    n = ids.size
    lens = 20 + (_mix(seed, 1, ids) % np.uint64(181)).astype(np.int64)
    total = int(lens.sum())
    # flat (doc, token-slot) hash stream: key = id * 4096 + slot
    doc_rep = np.repeat(ids, lens)
    ends = np.cumsum(lens)
    slot = np.arange(total, dtype=np.uint64) - np.repeat(ends - lens, lens).astype(np.uint64)
    with np.errstate(over="ignore"):
        hs = _mix(seed, 2, doc_rep * np.uint64(4096) + slot)
    u = hs.astype(np.float64) / float(2**64)
    tok_idx = np.searchsorted(_CUM, u, side="right").clip(0, _VOCAB.size - 1)
    toks = _VOCAB[tok_idx]
    with np.errstate(over="ignore"):
        sep_h = _mix(seed, 3, doc_rep * np.uint64(4096) + slot) % np.uint64(100)
    seps = _SEPS[np.select([sep_h < 96, sep_h < 98, sep_h < 99], [0, 1, 2], 3)]
    texts = []
    start = 0
    for e in ends:
        e = int(e)
        parts = np.empty(2 * (e - start) - 1, dtype=object)
        parts[0::2] = toks[start:e]
        parts[1::2] = seps[start:e - 1]
        texts.append("".join(parts))
        start = e
    texts = pd.Series(texts, dtype=object)
    urlh = _mix(seed, 4, ids)
    urls = pd.Series([f"https://example-{h:016x}.test/p/{i}" for h, i in zip(urlh, ids)])
    ts = pd.Series(pd.Timestamp(EPOCH) + pd.to_timedelta(ids.astype(np.int64), unit="s"))
    html = texts.map(lambda t: b"<html><body>" + t.encode("utf-8") + b"</body></html>")
    lang_h = _mix(seed, 5, ids) % np.uint64(100)
    lang = pd.Series(_LANGS[np.select([lang_h < 95, lang_h < 98], [0, 1], 2)])
    return pd.DataFrame({"url": urls, "warc_ts": ts, "html": html,
                         "text": texts, "lang": lang})


PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def pages_df(spark, n_docs: int, seed: int = SEED, partitions: int = 32):
    """Distributed deterministic pages table (Common-Crawl-style,
    BASELINE.json input_hint shape)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pages_pandas(b["id"].to_numpy(np.uint64), seed)
    return (spark.range(0, n_docs, numPartitions=partitions)
            .mapInPandas(gen, schema=PAGES_SCHEMA))


# ---------------------------------------------------------------------------
# Contacts — reference-parity corpus (spec/samples/contacts.csv shape:
# id,first_name,last_name; 49,999 rows — tasks/fates.rake:44-49).
# ---------------------------------------------------------------------------

_FIRST = np.array(["James", "Mary", "John", "Patricia", "Robert", "Jennifer",
                   "Michael", "Linda", "William", "Elizabeth", "David",
                   "Barbara", "Richard", "Susan", "Joseph", "Jessica",
                   "Thomas", "Sarah", "Charles", "Karen"], dtype=object)
_LAST = np.array(["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia",
                  "Miller", "Davis", "Rodriguez", "Martinez", "Hernandez",
                  "Lopez", "Gonzalez", "Wilson", "Anderson", "Taylor",
                  "Moore", "Jackson", "Martin", "Lee"], dtype=object)


def contacts_pandas(n: int = 49_999, seed: int = SEED) -> pd.DataFrame:
    return contacts_from_ids(np.arange(1, n + 1, dtype=np.uint64), seed)


def contacts_df(spark, n: int = 49_999, seed: int = SEED, partitions: int = 16):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield contacts_from_ids(b["id"].to_numpy(np.int64) + 1, seed)
    return (spark.range(0, n, numPartitions=partitions)
            .mapInPandas(gen, schema="id long, first_name string, last_name string"))


def contacts_from_ids(ids: np.ndarray, seed: int = SEED) -> pd.DataFrame:
    # Zipf-ish skew over the name lists so 'Smith' is a head term
    ids = np.asarray(ids, dtype=np.uint64)
    fw = np.arange(1, _FIRST.size + 1, dtype=np.float64) ** -0.9
    lw = np.arange(1, _LAST.size + 1, dtype=np.float64) ** -0.9
    fcum, lcum = np.cumsum(fw / fw.sum()), np.cumsum(lw / lw.sum())
    fu = _mix(seed, 10, ids).astype(np.float64) / 2**64
    lu = _mix(seed, 11, ids).astype(np.float64) / 2**64
    return pd.DataFrame({
        "id": ids.astype(np.int64),
        "first_name": _FIRST[np.searchsorted(fcum, fu).clip(0, _FIRST.size - 1)],
        "last_name": _LAST[np.searchsorted(lcum, lu).clip(0, _LAST.size - 1)],
    })
