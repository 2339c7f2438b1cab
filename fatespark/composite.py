"""Composite aggregation — the ES ``composite`` agg: paginated bucket
enumeration over one or more grouping sources in deterministic key
order, resumable with ``after``.

ES materializes buckets in source-key order and pages with an
``after_key`` so a client can stream EVERY bucket of a high-cardinality
aggregation without a giant single response — the scale contract this
implements: the output of a page is ``size`` rows no matter the bucket
cardinality, the after-filter is a lexicographic key predicate (pushed
below the final ordering, so a page never materializes earlier pages),
and ordering is total (key tuples are unique by construction of the
groupBy).

Spark shape: ONE map-side-combinable count agg over the sources + a
k-bounded TakeOrderedAndProject per page.  The agg re-runs per page
(ES walks a doc-values index instead; with a bucketed/sorted layout the
same skip applies here) — documented, and the page response stays
bounded either way.

Sources are (name, Column) pairs — terms sources pass a column,
histogram sources pass ``floor(col / interval) * interval``, the ES
``histogram`` composite source.

Reference analogue: none (fates has no aggregations) — target-new, the
ES aggregation serving surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["composite_agg", "histogram_source", "composite_agg_sql"]


def histogram_source(col, interval: float) -> Column:
    """ES composite histogram source: floor(value / interval) * interval."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / F.lit(interval)) * F.lit(interval))


def _after_pred(names: list[str], after: tuple):
    """Lexicographic (k1, ..., kn) > after — the ES after_key resume
    predicate."""
    pred = None
    for i in range(len(names)):
        eq = None
        for j in range(i):
            e = F.col(names[j]) == F.lit(after[j])
            eq = e if eq is None else eq & e
        gt = F.col(names[i]) > F.lit(after[i])
        arm = gt if eq is None else eq & gt
        pred = arm if pred is None else pred | arm
    return pred


def composite_agg(df: DataFrame, sources: list[tuple[str, Column | str]],
                  size: int = 10, after: tuple | None = None) -> DataFrame:
    """One page of (source..., n) buckets in ascending source order,
    starting strictly after the ``after`` key tuple.  The LAST row of a
    page is the next call's ``after`` (the ES after_key)."""
    if not sources:
        raise ValueError("composite_agg needs >= 1 source")
    if after is not None and len(after) != len(sources):
        raise ValueError("after key arity != number of sources")
    names = [n for n, _ in sources]
    cols = [(F.col(c) if isinstance(c, str) else c).alias(n)
            for n, c in sources]
    agg = df.select(*cols).groupBy(*names).agg(F.count("*").alias("n"))
    if after is not None:
        agg = agg.filter(_after_pred(names, after))
    return agg.orderBy(*[F.asc(n) for n in names]).limit(size)


def composite_agg_sql(src: str, sources: list[tuple[str, str]],
                      size: int = 10, after: tuple | None = None) -> str:
    """DuckDB twin: same grouping expressions, same lexicographic
    after predicate, same ordering and page cut."""
    names = [n for n, _ in sources]
    sel = ", ".join(f"{expr} AS {n}" for n, expr in sources)
    where = ""
    if after is not None:
        arms = []
        for i in range(len(names)):
            parts = [f"{names[j]} = {after[j]!r}" for j in range(i)]
            parts.append(f"{names[i]} > {after[i]!r}")
            arms.append("(" + " AND ".join(parts) + ")")
        where = "WHERE " + " OR ".join(arms)
    order = ", ".join(f"{n} ASC" for n in names)
    return f"""
SELECT * FROM (
  SELECT {", ".join(names)}, count(*) AS n
  FROM (SELECT {sel} FROM {src})
  GROUP BY {", ".join(names)}
)
{where}
ORDER BY {order} LIMIT {size}"""
