"""End-to-end training-corpus curation: the composed pipeline a webtext
pretraining run actually executes before indexing/tokenizing — quality gate,
language allow-list, exact near-duplicate removal, deterministic split
assignment — as ONE declarative DataFrame plan.

Everything here is a composition of already-tested primitives
(``textops.quality_score_col``, ``dedup.exact_duplicate_groups``,
``sampling.assign_splits``), so the whole pipeline stays JVM-side (no Python
in the hot path) and Catalyst sees one plan: the quality/language predicates
evaluate inside the scan stage, the dedup keep-set is the only shuffle
(hash-agg on fingerprint + left-semi join back), and the split label is a
pure hash expression. At 10^12 docs the plan's cost is one scan + one
fingerprint shuffle — the same as exact dedup alone; the filters are free
riders (they PRUNE the shuffle's input).

Determinism: every stage is a pure function of (text, doc_id, seed) — no
sampling RNG, no partition-order dependence — so the same corpus curates to
the byte-identical output on any cluster size (the property the DuckDB twin
checks value-exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_duplicate_groups
from .sampling import assign_splits
from .textops import quality_score_col


def curate_corpus(docs: DataFrame, *, min_quality: float = 0.25,
                  langs: list[str] | None = None,
                  split_weights: dict[str, float] | None = None,
                  seed: str = "split", text_col: str = "text",
                  id_col: str = "doc_id",
                  lang_col: str = "lang") -> DataFrame:
    """Curated corpus view: (id, lang, quality, split) for every SURVIVING
    document.

    Stages, in plan order (all lazy, one composed plan):
      1. quality gate: Gopher/C4-style signal score >= ``min_quality``
      2. language allow-list (skipped when ``langs`` is None)
      3. exact dedup among the docs that PASSED 1-2: keep the min-id
         representative of each normalized-text fingerprint group
      4. stable split assignment (md5-keyed, cluster-invariant)

    Dedup runs after the filters on purpose: a high-quality doc must not be
    dropped because a low-quality twin had a smaller id, and filtering
    first shrinks the fingerprint shuffle. Quality is floor-quantized to 4
    decimals in the OUTPUT only (ranking/filtering use the raw float64).
    """
    q = quality_score_col(text_col)
    kept = docs.filter(q >= F.lit(min_quality))
    if langs is not None:
        kept = kept.filter(F.col(lang_col).isin(list(langs)))
    keep_ids = (exact_duplicate_groups(kept, text_col, id_col)
                .select(F.col("keep_id").alias(id_col)))
    kept = kept.join(keep_ids, id_col, "left_semi")
    kept = assign_splits(kept, split_weights or
                         {"train": 0.9, "val": 0.05, "test": 0.05},
                         key_col=id_col, seed=seed)
    return kept.select(
        id_col, lang_col,
        (F.floor(quality_score_col(text_col) * 10000) / 10000)
        .alias("quality"),
        "split")
