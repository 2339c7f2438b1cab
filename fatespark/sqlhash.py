"""SQL (DuckDB) expression generators for the engine's deterministic u64
hash primitives — so the driver's DuckDB oracles can replicate
splitmix64-based operators (minhash, simhash, LSH hyperplanes) bit-exactly.

Domain discipline: every generated expression evaluates to a HUGEINT in
[0, 2**64). DuckDB HUGEINT is int128, so 64-bit wrap-around semantics are
emulated explicitly:

- add: sum of two in-domain values < 2**65 fits int128; wrap with % 2**64.
- mul: full 64x64 products can overflow int128, so multiply via 32-bit
  halves (lo*lo + ((hi*lo + lo*hi) mod 2**32) << 32) — every intermediate
  fits int128.
- xor / >>: DuckDB's ``xor()`` and ``>>`` operate on HUGEINT natively and
  are exact for non-negative in-domain values.

These mirror ``fatespark.corpus.splitmix64`` (the numpy reference); parity
is property-tested in ``tests/test_sqlhash.py``.
"""

from __future__ import annotations

import hashlib

U64 = 1 << 64
U32 = 1 << 32

# splitmix64 constants (public-domain finalizer, Steele et al.)
C1 = 0x9E3779B97F4A7C15
C2 = 0xBF58476D1CE4E5B9
C3 = 0x94D049BB133111EB


def u64_lit(x: int) -> str:
    """HUGEINT literal for a python int in [0, 2**64)."""
    return f"{x & (U64 - 1)}::HUGEINT"


def add64(a: str, b: str) -> str:
    return f"((({a}) + ({b})) % {U64}::HUGEINT)"


def mul64(a: str, b: str) -> str:
    """(a * b) mod 2**64 via 32-bit split; operands referenced twice each,
    so pass column/alias references, not large sub-expressions."""
    return (f"(((({a}) % {U32}) * (({b}) % {U32})"
            f" + (((({a}) // {U32}) * (({b}) % {U32})"
            f" + (({a}) % {U32}) * (({b}) // {U32})) % {U32}) * {U32})"
            f" % {U64}::HUGEINT)")


def xor64(a: str, b: str) -> str:
    return f"xor(({a})::HUGEINT, ({b})::HUGEINT)"


def shr64(x: str, n: int) -> str:
    return f"(({x}) >> {n})"


def to_i64(x: str) -> str:
    """Reinterpret an in-domain u64 as the engine's int64 view."""
    return (f"(CASE WHEN ({x}) >= {1 << 63} THEN ({x}) - {U64}"
            f" ELSE ({x}) END)::BIGINT")


def splitmix64_steps(x: str, prefix: str) -> tuple[list[tuple[str, str]],
                                                   str]:
    """Stepwise splitmix64 as (alias, expr) pairs for a SELECT list using
    DuckDB lateral column references; returns (steps, final_alias). ``x``
    must already be in [0, 2**64)."""
    a, b, c = f"{prefix}_z0", f"{prefix}_z1", f"{prefix}_z2"
    out = f"{prefix}_h"
    steps = [
        (a, add64(x, u64_lit(C1))),
        (b, mul64(xor64(a, shr64(a, 30)), u64_lit(C2))),
        (c, mul64(xor64(b, shr64(b, 27)), u64_lit(C3))),
        (out, xor64(c, shr64(c, 31))),
    ]
    return steps, out


def select_steps(steps: list[tuple[str, str]]) -> str:
    """Render (alias, expr) pairs as SELECT-list fragments."""
    return ",\n       ".join(f"{e} AS {a}" for a, e in steps)


def md5_u64(s: str) -> str:
    """First 8 bytes of md5 of a string expression, as u64 HUGEINT — the
    SQL twin of ``dedup.token_hash_u64`` (int.from_bytes(md5[:8], 'big'))."""
    return (f"list_reduce(list_prepend(0::HUGEINT, list_transform("
            f"string_split(substr(md5({s}), 1, 16), ''), "
            f"c -> (strpos('0123456789abcdef', c) - 1)::HUGEINT)), "
            f"(acc, v) -> acc * 16 + v)")


def splitmix64_py(x: int) -> int:
    """Scalar python reference (for computing literal seeds to inline)."""
    z = (x + C1) % U64
    z = ((z ^ (z >> 30)) * C2) % U64
    z = ((z ^ (z >> 27)) * C3) % U64
    return z ^ (z >> 31)


def md5_u64_py(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8],
                          "big")


def md5_bucket60(key_expr: str, seed: str, buckets: int) -> str:
    """SQL twin of ``sampling.bucket_col``: first 60 bits (15 hex nibbles)
    of md5(seed ':' key) mod buckets, as BIGINT. ``key_expr`` is any SQL
    expression; it is cast to VARCHAR like Spark's cast('string')."""
    h = (f"list_reduce(list_prepend(0::HUGEINT, list_transform("
         f"string_split(substr(md5('{seed}:' || ({key_expr})::VARCHAR), "
         f"1, 15), ''), "
         f"c -> (strpos('0123456789abcdef', c) - 1)::HUGEINT)), "
         f"(acc, v) -> acc * 16 + v)")
    return f"CAST(({h}) % {buckets} AS BIGINT)"
