"""Spell suggestion ("did you mean") over the index term dictionary.

SymSpell-style deletion banding (Garbe's symmetric-delete algorithm, the
standard scale trick): every dictionary term emits itself plus all
single-character deletions as *band keys*; a query term emits the same.
Two terms within Levenshtein distance 1 ALWAYS share a band key (equal /
substitution -> delete the differing position on both sides; insertion or
deletion -> the shorter string itself is a deletion of the longer), so the
equi-join on the key is a complete candidate generator for distance <= 1 —
no all-pairs comparison ever happens. With ``max_edit=2`` the same depth-1
band also surfaces the delete∘insert-shaped distance-2 pairs (notably ALL
adjacent transpositions: delete one of the swapped characters on each side
and the variants coincide); full distance-2 recall would need depth-2
deletions — documented partial, never wrong (every emitted pair is
verified with an exact ``levenshtein`` filter).

Scale shape: the dictionary expansion is a narrow projection of the terms
table (O(vocab x avg_len) rows, JVM higher-order functions, no Python);
the query side is a handful of rows broadcast into an equi-join, so the
join shuffles only the dictionary variants — and for a served system the
caller persists ``dictionary_variants`` once (bucketed by ``variant``) and
passes it back in, making each suggestion lookup a pruned probe instead of
a recompute, same pattern as ann.LshVectorIndex.

The reference has no fuzzy matching at all (fates matches exact suffixes
only, ``lib/suffix_array_reader.rb``); this is a target-new capability the
web-search surface needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "dictionary_variants", "expand_fuzzy",
           "suggest"]

# term + every single-character deletion, deduplicated — pure JVM
_VARIANTS_EXPR = (
    "array_distinct(concat(array({c}), "
    "transform(sequence(1, length({c})), "
    "i -> concat(substring({c}, 1, i - 1), substring({c}, i + 1)))))"
)


def deletion_variants(term: str) -> list[str]:
    """Driver-side twin of the JVM expression (query terms are few)."""
    out = [term]
    for i in range(len(term)):
        v = term[:i] + term[i + 1:]
        if v not in out:
            out.append(v)
    return out


def dictionary_variants(terms_df: DataFrame) -> DataFrame:
    """(variant, term, df) — the banded dictionary. Persist this bucketed
    by ``variant`` for a served system; recomputed inline it is one narrow
    map over the terms table."""
    return (terms_df
            .select("term", "df",
                    F.explode(F.expr(_VARIANTS_EXPR.format(c="term")))
                    .alias("variant")))


def suggest(index, qterms: list[str], *, k: int = 5, max_edit: int = 2,
            variants: DataFrame | None = None) -> DataFrame:
    """Top-``k`` corrections per query term: (qterm, suggestion, dist, df,
    rank), ranked by (edit distance ASC, document frequency DESC,
    suggestion ASC) — the classic did-you-mean ordering (closest, then
    most common). Complete for distance <= 1; ``max_edit=2`` additionally
    surfaces the depth-1-band distance-2 pairs (see module docstring).

    ``variants``: a pre-persisted ``dictionary_variants`` table to probe
    instead of recomputing the expansion.
    """
    spark = index.spark
    # length-window prune BEFORE expansion/probe: |len(a)-len(b)| <= dist,
    # so terms outside [min_qlen - max_edit, max_qlen + max_edit] can never
    # verify — pushes a cheap predicate into the terms scan and cuts the
    # deletion expansion to a sliver of the vocabulary
    qlens = [len(q) for q in qterms if q]
    lo, hi = min(qlens) - max_edit, max(qlens) + max_edit
    if variants is not None:
        dvar = variants.filter(F.length("term").between(lo, hi))
    else:
        dvar = dictionary_variants(
            index.terms.filter(F.length("term").between(lo, hi)))
    qrows = [(q, v) for q in dict.fromkeys(qterms)
             for v in deletion_variants(q)]
    qv = spark.createDataFrame(qrows, "qterm string, variant string")
    cand = (dvar.join(F.broadcast(qv), "variant")
            .select("qterm", "term", "df").distinct())
    dist = F.levenshtein(F.col("qterm"), F.col("term"))
    scored = (cand.select("qterm", F.col("term").alias("suggestion"),
                          dist.alias("dist"), "df")
              .filter(F.col("dist") <= max_edit))
    w = Window.partitionBy("qterm").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("suggestion"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy("qterm", "rank"))


def expand_fuzzy(index, term: str, *, max_edit: int = 1,
                 max_terms: int = 256,
                 variants: DataFrame | None = None) -> list[str]:
    """Dictionary terms within Levenshtein distance ``max_edit`` of
    ``term`` (Lucene ``term~N`` fuzzy-query expansion) — the query-time
    twin of ``suggest``: same deletion-band candidate generation, same
    exact-distance verify, returned as the sorted expansion set for an
    OR-BM25 term bag (like ``expand_prefix``).

    Only ``max_edit=1`` is offered: depth-1 banding is COMPLETE there, so
    the expansion equals the exact ``levenshtein(dict_term, term) <= 1``
    set and fuzzy ranking stays oracle-checkable. At distance 2 the band
    is a documented partial generator — fine for "did you mean" ranking,
    wrong for a scoring expansion where silent recall loss would silently
    change results.

    ``max_terms`` caps a pathological neighborhood (cap order: distance
    ASC, df DESC, term ASC — keep the corrections that match the most
    docs), mirroring ``expand_prefix``'s ``max_terms``.
    """
    if max_edit != 1:
        raise ValueError(
            "expand_fuzzy supports max_edit=1 only (depth-1 deletion "
            "banding is complete there; distance-2 recall would need "
            "depth-2 bands)")
    s = suggest(index, [term], k=max_terms, max_edit=1, variants=variants)
    return sorted({r["suggestion"] for r in s.collect()})
