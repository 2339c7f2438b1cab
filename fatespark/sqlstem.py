"""Porter stemmer as pure DuckDB SQL — the oracle twin of ``stem.py``.

Generates a CTE chain that stems a vocabulary column step-for-step after
Porter 1980, mirroring ``fatespark.stem.porter_stem`` exactly (same rule
tables, same guard, same branch order) but re-implemented in SQL so the
``ft_stemmed_topk`` driver query gets a value-hash oracle instead of a
rows-only check: DuckDB independently recomputes tokenize -> fold -> STEM ->
tf/df/avgdl -> BM25 with no Python in the loop.

The only shared artifacts between engine and oracle are the published rule
tables (`_STEP2/_STEP3/_STEP4` imported from stem.py — they are data from
the paper, not code); every predicate (cv-form, measure m, *v*, *d, *o) is
re-derived here as SQL expressions. The cv-form fold uses list_reduce over
the character list because 'y''s class depends on the preceding class
(paper §2) — a per-position map cannot express it.

Reference: the reference repo has no stemmer (fates indexes raw suffixes,
lib/fates.rb tokenizes verbatim); stemming is target-new per BASELINE.json
north_star ("tokenization and stemming of extracted page text").
"""

from __future__ import annotations

from .stem import _STEP2, _STEP3, _STEP4


def _cv(e: str) -> str:
    """SQL: consonant/vowel form of expression ``e`` ('y' is a vowel only
    after a consonant-class char, stem.py:_cv)."""
    return (
        "list_reduce(list_prepend('', "
        f"list_transform(range(1, length({e}) + 1), "
        f"i -> substr({e}, i, 1))), "
        "(acc, ch) -> acc || (CASE "
        "WHEN ch IN ('a','e','i','o','u') THEN 'v' "
        "WHEN ch = 'y' AND acc <> '' AND substr(acc, -1) = 'c' THEN 'v' "
        "ELSE 'c' END))"
    )


def _m(e: str) -> str:
    """SQL: Porter measure — count of non-overlapping 'vc' pairs in the
    cv-form (stem.py:_m; collapsed-run counting == pair counting)."""
    cv = _cv(e)
    return f"((length({cv}) - length(replace({cv}, 'vc', ''))) // 2)"


def _hv(e: str) -> str:
    """SQL: *v* — stem contains a vowel-class char."""
    return f"contains({_cv(e)}, 'v')"


def _dbl(e: str) -> str:
    """SQL: *d — ends with a double consonant."""
    return (f"(length({e}) >= 2 AND substr({e}, -1) = substr({e}, -2, 1) "
            f"AND substr({_cv(e)}, -1) = 'c')")


def _cvc(e: str) -> str:
    """SQL: *o — ends cvc where the final c is not w, x or y."""
    return (f"(length({e}) >= 3 AND substr({_cv(e)}, -3) = 'cvc' "
            f"AND substr({e}, -1) NOT IN ('w','x','y'))")


def _drop(e: str, n: int) -> str:
    return f"substr({e}, 1, length({e}) - {n})"


def porter_stages_sql(src: str) -> str:
    """CTE chunk ``pvg AS (...), ..., vstem AS (SELECT term, stem ...)``
    stemming the distinct ``term`` column of CTE/table ``src``.

    Embed as ``WITH <other>, {porter_stages_sql('v0')} SELECT ... FROM
    vstem``. Guard matches porter_stem: len > 2 and ASCII-alphabetic (the
    input is already ASCII-folded, so '^[a-z]+$' is exactly
    isascii+isalpha on folded tokens — uppercase ASCII cannot survive the
    fold, and any non-ASCII letter fails the regex as it fails isascii).
    """
    # step 2/3: first suffix match in table order wins (python breaks on
    # endswith regardless of whether the m-condition then fires)
    def rules_23(pairs, prev):
        whens = []
        for suf, repl in pairs:
            stem = _drop(prev, len(suf))
            whens.append(
                f"WHEN {prev} LIKE '%{suf}' THEN "
                f"(CASE WHEN {_m(stem)} > 0 THEN {stem} || '{repl}' "
                f"ELSE {prev} END)")
        return "CASE " + " ".join(whens) + f" ELSE {prev} END"

    step4_whens = []
    for suf in _STEP4:
        stem = _drop("w", len(suf))
        if suf == "ion":
            cond = f"{_m(stem)} > 1 AND substr({stem}, -1) IN ('s','t')"
        else:
            cond = f"{_m(stem)} > 1"
        step4_whens.append(
            f"WHEN w LIKE '%{suf}' THEN "
            f"(CASE WHEN {cond} THEN {stem} ELSE w END)")
    step4 = "CASE " + " ".join(step4_whens) + " ELSE w END"

    s5a_stem = _drop("w", 1)
    return f"""
pvg AS (
  SELECT term,
         (length(term) > 2 AND regexp_matches(term, '^[a-z]+$')) AS go
  FROM (SELECT DISTINCT term FROM {src})
),
ps1a AS (
  SELECT term, go,
         CASE WHEN term LIKE '%sses' THEN {_drop("term", 2)}
              WHEN term LIKE '%ies' THEN {_drop("term", 2)}
              WHEN term LIKE '%ss' THEN term
              WHEN term LIKE '%s' THEN {_drop("term", 1)}
              ELSE term END AS w
  FROM pvg
),
ps1b0 AS (
  SELECT term, go,
         CASE WHEN w LIKE '%eed' THEN
                (CASE WHEN {_m(_drop("w", 3))} > 0 THEN {_drop("w", 1)}
                 ELSE w END)
              WHEN w LIKE '%ed' AND {_hv(_drop("w", 2))} THEN {_drop("w", 2)}
              WHEN w LIKE '%ing' AND {_hv(_drop("w", 3))} THEN {_drop("w", 3)}
              ELSE w END AS wb,
         CASE WHEN w LIKE '%eed' THEN FALSE
              WHEN w LIKE '%ed' AND {_hv(_drop("w", 2))} THEN TRUE
              WHEN w LIKE '%ing' AND {_hv(_drop("w", 3))} THEN TRUE
              ELSE FALSE END AS fired
  FROM ps1a
),
ps1b AS (
  SELECT term, go,
         CASE WHEN NOT fired THEN wb
              WHEN wb LIKE '%at' OR wb LIKE '%bl' OR wb LIKE '%iz'
                THEN wb || 'e'
              WHEN {_dbl("wb")} AND substr(wb, -1) NOT IN ('l','s','z')
                THEN {_drop("wb", 1)}
              WHEN {_m("wb")} = 1 AND {_cvc("wb")} THEN wb || 'e'
              ELSE wb END AS w
  FROM ps1b0
),
ps1c AS (
  SELECT term, go,
         CASE WHEN w LIKE '%y' AND {_hv(_drop("w", 1))}
              THEN {_drop("w", 1)} || 'i' ELSE w END AS w
  FROM ps1b
),
ps2 AS (SELECT term, go, {rules_23(_STEP2, "w")} AS w FROM ps1c),
ps3 AS (SELECT term, go, {rules_23(_STEP3, "w")} AS w FROM ps2),
ps4 AS (SELECT term, go, {step4} AS w FROM ps3),
ps5a AS (
  SELECT term, go,
         CASE WHEN w LIKE '%e'
                   AND ({_m(s5a_stem)} > 1
                        OR ({_m(s5a_stem)} = 1 AND NOT {_cvc(s5a_stem)}))
              THEN {s5a_stem} ELSE w END AS w
  FROM ps4
),
ps5b AS (
  SELECT term, go,
         CASE WHEN {_m("w")} > 1 AND {_dbl("w")} AND w LIKE '%l'
              THEN {_drop("w", 1)} ELSE w END AS w
  FROM ps5a
),
vstem AS (SELECT term, CASE WHEN go THEN w ELSE term END AS stem FROM ps5b)"""
