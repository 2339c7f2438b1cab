"""Doc-id derived routing: bucket (doc-hash partition) and salt (doc-range
split for skew-aware merge). Pure numpy so the same code runs in every pandas
UDF and in local tests.

- ``bucket = splitmix64(u64o(doc_id)) % n_buckets`` — uniform doc partitioning
  of the index; each bucket's postings are scored independently at query time
  (document-partitioned index, the standard sharding for distributed search).
- ``salt = top salt_bits of u64o(doc_id)`` — splits a (bucket, term) merge
  group into doc-range-DISJOINT, ORDERED sub-groups, so head-term (Zipf) merge
  groups stay bounded without a second merge pass: per-salt outputs are
  already in global doc order (north_rule: explicit skew handling). With
  xxhash64 doc ids the top bits are uniform; with small sequential test ids
  salting degenerates to one salt, which is exactly the regime where skew is
  irrelevant.
"""

from __future__ import annotations

import numpy as np

from .codec import _i64_to_u64_ordered
from .corpus import splitmix64


def u64o(doc_ids: np.ndarray) -> np.ndarray:
    return _i64_to_u64_ordered(np.asarray(doc_ids, dtype=np.int64))


def bucket_of(doc_ids: np.ndarray, n_buckets: int) -> np.ndarray:
    return (splitmix64(u64o(doc_ids)) % np.uint64(n_buckets)).astype(np.int32)


def salt_of(doc_ids: np.ndarray, salt_bits: int) -> np.ndarray:
    if salt_bits <= 0:
        return np.zeros(np.asarray(doc_ids).size, dtype=np.int32)
    return (u64o(doc_ids) >> np.uint64(64 - salt_bits)).astype(np.int32)
