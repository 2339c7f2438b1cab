"""Web-search query-string language over the engine's query surface.

The reference takes raw query strings (``rake fates:search QUERY=...``,
``tasks/fates.rake:67-129``; ``Model.fulltext_find(query)``,
``lib/fates.rb:53``) with suffix semantics handled by ``compat.FatesIndex``.
This module adds the boolean string syntax a web-search user expects —
target-new, composed entirely from existing engine primitives so every
parsed form keeps its oracle-checked scoring:

    merge scan          two terms (mode-controlled AND/OR)
    -join               exclusion: docs containing the term are dropped
                        BEFORE top-k (rank back-fill; ``search(exclude=)``)
    st*                 prefix: dictionary range-expansion to OR-terms
    -st*                excluded prefix: the expansion joins the NOT-set
    "big data"          quoted phrase (positions-verified adjacency)
    "big dat"*          phrase-prefix (fates' natural suffix semantics)
    "big data"~3        proximity: all quoted terms within a token window
                        of span <= 3 (unordered; ``search_near``)
    len:[300 TO 450]    numeric range filter (Lucene range syntax): the
                        named trie-indexed numeric field restricts results
                        to the inclusive range via the covering-token
                        IN-list (``numeric.split_range``; field names map
                        via ``execute(numeric_fields=...)``)
    joib~1              fuzzy term: dictionary terms within Levenshtein
                        distance 1 (or ``~2``, depth-2 bands) join the OR
                        bag (COMPLETE deletion-band expansion,
                        ``suggest.expand_fuzzy``; ``~0`` is the exact
                        term)
    join^2              term boost: the term's score contribution is
                        multiplied (Lucene ``^`` semantics; bare positive
                        terms only — ``search(boosts=)``)
    source:src3         field filter: docs whose named field contains the
                        value (index-side restriction, ``search(
                        filter_terms=, filter_field=)``; field names map
                        via ``execute(field_names=...)``)

Terms and prefixes compose freely with exclusions in ONE ``search()`` call
(prefix atoms are just dictionary expansions, so no extra scoring path).
A quoted phrase is scored by the phrase matcher as a pseudo-term and cannot
be mixed with other positive atoms in one ranked query — the engine scores
phrases and term-bags with different df statistics, and silently summing
them would be a new (un-oracled) ranking function; ``execute`` raises
``UnsupportedQueryError`` for mixes instead of guessing.

Works against BOTH readers (``SearchIndex`` and ``LocalSearchIndex`` share
the ``expand_prefix`` / ``search`` / ``search_phrase`` /
``search_phrase_prefix`` surface).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class QuerySyntaxError(ValueError):
    pass


class UnsupportedQueryError(ValueError):
    pass


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)
    phrase: str | None = None
    phrase_prefix: bool = False
    slop: int | None = None
    exclude_terms: list[str] = field(default_factory=list)
    exclude_prefixes: list[str] = field(default_factory=list)
    filters: list[tuple[str, str]] = field(default_factory=list)  # (field, value)
    boosts: dict[str, float] = field(default_factory=dict)  # term -> mult
    fuzzy: list[tuple[str, int]] = field(default_factory=list)  # (term, max_edit)
    range_filter: tuple[str, int, int] | None = None  # (field, lo, hi)


def parse_query(q: str) -> ParsedQuery:
    """Split a query string into atoms. Quoting is the only grouping; a
    ``-`` immediately before an atom negates it; a trailing ``*`` on a bare
    term (or directly after a closing quote) makes it a prefix."""
    out = ParsedQuery()
    i, n = 0, len(q)
    while i < n:
        if q[i].isspace():
            i += 1
            continue
        neg = False
        if q[i] == "-" and i + 1 < n and not q[i + 1].isspace():
            neg = True
            i += 1
        if i < n and q[i] == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise QuerySyntaxError(f"unterminated quote at {i}: {q!r}")
            body = q[i + 1:j]
            i = j + 1
            starred = i < n and q[i] == "*"
            if starred:
                i += 1
            slop = None
            if not starred and i < n and q[i] == "~":
                j2 = i + 1
                while j2 < n and q[j2].isdigit():
                    j2 += 1
                if j2 == i + 1:
                    raise QuerySyntaxError(
                        f"'~' must be followed by a slop number at {i}: "
                        f"{q!r}")
                slop = int(q[i + 1:j2])
                i = j2
            if not body.strip():
                continue
            if neg:
                raise UnsupportedQueryError(
                    "phrase exclusion (-\"...\") is not supported")
            if out.phrase is not None:
                raise UnsupportedQueryError(
                    "multiple phrases in one query are not supported")
            out.phrase = body.strip()
            out.phrase_prefix = starred
            out.slop = slop
            continue
        j = i
        while j < n and not q[j].isspace():
            j += 1
        tok = q[i:j]
        i = j
        starred = tok.endswith("*") and len(tok) > 1
        if starred:
            tok = tok[:-1]
        if "*" in tok:
            raise QuerySyntaxError(f"embedded '*' in {tok!r} (only a "
                                   "trailing '*' is a prefix)")
        if not tok:
            continue
        boost = None
        if "^" in tok[1:]:
            body, _, bs = tok.rpartition("^")
            try:
                boost = float(bs)
            except ValueError:
                raise QuerySyntaxError(
                    f"'^' must be followed by a number in {tok!r}")
            if boost <= 0.0:
                raise QuerySyntaxError(f"boost must be > 0 in {tok!r}")
            tok = body
        if boost is not None and (neg or starred or ":" in tok[1:-1]):
            raise UnsupportedQueryError(
                f"boosts apply to bare positive terms only: {tok!r}")
        if "~" in tok[1:]:  # fuzzy term (Lucene term~N); '~' strictly after
            body, _, ds = tok.rpartition("~")
            if not ds.isdigit():
                raise QuerySyntaxError(
                    f"'~' must be followed by an edit distance in {tok!r}")
            if neg or starred or boost is not None or ":" in body[1:-1]:
                raise UnsupportedQueryError(
                    f"fuzzy applies to bare positive terms only: {tok!r}")
            dist = int(ds)
            if dist == 0:
                out.terms.append(body)
            else:
                out.fuzzy.append((body, dist))
            continue
        if ":" in tok[1:-1]:  # field filter — ':' strictly interior
            if neg or starred:
                raise UnsupportedQueryError(
                    f"field filters cannot be negated or prefixed: {tok!r}")
            fname, _, fval = tok.partition(":")
            if fval.startswith("["):
                # Lucene numeric range: name:[lo TO hi] — the tokenizer
                # split it at whitespace, so re-join from the raw string
                j2 = q.find("]", i - len(fval))
                if j2 < 0:
                    raise QuerySyntaxError(
                        f"unterminated range bracket in {tok!r}")
                body = q[i - len(fval) + 1:j2]
                i = j2 + 1
                parts = body.split()
                if len(parts) != 3 or parts[1].upper() != "TO":
                    raise QuerySyntaxError(
                        f"range must be [lo TO hi]: [{body}]")
                try:
                    lo, hi = int(parts[0]), int(parts[2])
                except ValueError:
                    raise QuerySyntaxError(
                        f"range bounds must be integers: [{body}]")
                if out.range_filter is not None:
                    raise UnsupportedQueryError(
                        "one numeric range filter per query")
                out.range_filter = (fname, lo, hi)
                continue
            out.filters.append((fname, fval))
            continue
        bucket = (
            (out.exclude_prefixes if starred else out.exclude_terms)
            if neg else (out.prefixes if starred else out.terms))
        bucket.append(tok)
        if boost is not None:
            out.boosts[tok] = boost
    if out.phrase is not None and (out.terms or out.prefixes or out.fuzzy):
        raise UnsupportedQueryError(
            "mixing a quoted phrase with other positive atoms is not "
            "supported (phrase and term-bag scores use different df "
            "statistics)")
    if out.phrase is not None and (out.exclude_terms or
                                   out.exclude_prefixes):
        raise UnsupportedQueryError(
            "exclusions are not supported alongside a quoted phrase")
    if out.phrase is not None and (out.filters or out.range_filter):
        raise UnsupportedQueryError(
            "field filters are not supported alongside a quoted phrase")
    if (out.phrase is None and not out.terms and not out.prefixes
            and not out.fuzzy):
        if (out.exclude_terms or out.exclude_prefixes or out.filters
                or out.range_filter):
            raise UnsupportedQueryError(
                "purely negative or filter-only queries are not supported")
    return out


def execute(index, q: str | ParsedQuery, k: int = 10, mode: str = "OR",
            offset: int = 0, max_expansions: int = 256,
            field_names: dict[str, int] | None = None,
            numeric_fields: dict[str, int] | None = None,
            synonyms: dict[str, list[str]] | None = None, **kw):
    """Run a query string against either reader. Positive terms + expanded
    prefixes score as one term-bag ``search()`` (one job, one plan);
    excluded prefixes expand into the NOT-set; a lone quoted phrase routes
    to the phrase matcher. ``field:value`` atoms become the index-side
    metadata filter (``filter_terms``/``filter_field``) — ``field_names``
    maps names to index field ids; all filters must target ONE field (the
    engine restriction is per-field). Extra ``**kw`` (quantize, weights,
    use_wand, with_url) pass through to the underlying call."""
    spec = parse_query(q) if isinstance(q, str) else q
    if spec.phrase is not None:
        if spec.slop is not None:
            return index.search_near(spec.phrase, spec.slop, k=k,
                                     offset=offset, **kw)
        if spec.phrase_prefix:
            return index.search_phrase_prefix(
                spec.phrase, k=k, offset=offset,
                max_expansions=max_expansions, **kw)
        return index.search_phrase(spec.phrase, k=k, offset=offset, **kw)
    fterms, ffield = None, None
    if spec.range_filter is not None:
        if spec.filters:
            raise UnsupportedQueryError(
                "a numeric range cannot combine with term filters (one "
                "filter field per search)")
        fname, lo, hi = spec.range_filter
        nmap = numeric_fields or {}
        if fname not in nmap:
            raise UnsupportedQueryError(
                f"unknown numeric field {fname!r} (known: {sorted(nmap)})")
        from .numeric import split_range
        fterms, ffield = split_range(lo, hi), nmap[fname]
    if spec.filters:
        names = field_names or {}
        fids = set()
        vals = []
        for fname, fval in spec.filters:
            if fname not in names:
                raise UnsupportedQueryError(
                    f"unknown filter field {fname!r} (known: "
                    f"{sorted(names)})")
            fids.add(names[fname])
            vals.append(fval)
        if len(fids) > 1:
            raise UnsupportedQueryError(
                "filters across multiple fields are not supported in one "
                "query (one filter field per search)")
        fterms, ffield = vals, fids.pop()
    terms = list(spec.terms)
    if synonyms:
        # query-time synonym expansion: each synonym joins the term bag and
        # scores independently with its own df (plain OR-bag semantics —
        # the oracle-checked ranking function, no new score math). Under
        # AND the original terms stay required; synonyms are extra
        # evidence, so they expand only in OR mode.
        if mode != "OR":
            raise UnsupportedQueryError(
                "synonym expansion is OR-bag semantics; use mode='OR'")
        for t in spec.terms:
            terms.extend(synonyms.get(t, ()))
    for p in spec.prefixes:
        terms.extend(index.expand_prefix(p, max_expansions))
    for t, d in spec.fuzzy:
        if d > 2:
            raise UnsupportedQueryError(
                f"fuzzy distance {d} not supported (max ~2): {t!r}")
        # complete distance-<=d dictionary neighborhood (includes the term
        # itself when it exists); expansions join the OR bag like prefixes
        terms.extend(index.expand_fuzzy(t, max_edit=d,
                                        max_terms=max_expansions))
    excl = list(spec.exclude_terms)
    for p in spec.exclude_prefixes:
        excl.extend(index.expand_prefix(p, max_expansions))
    if not terms:
        # every positive atom expanded to nothing -> no matches by
        # definition; reuse the reader's empty-result shape
        return index.search(["\x00nosuchterm"], k=k, mode=mode)
    # a term appearing in both sets is a contradiction under AND and a
    # no-op-with-masking under OR; exclusion wins (web-search convention)
    return index.search(sorted(set(terms)), k=k, mode=mode, offset=offset,
                        exclude=sorted(set(excl)) or None,
                        filter_terms=fterms, filter_field=ffield,
                        boosts=spec.boosts or None, **kw)
