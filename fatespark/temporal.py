"""Temporal joins the built-in DataFrame API lacks: as-of join and
interval (point-in-range) join — the two canonical event-stream lookup
operators a web-scale pipeline needs next to the index (attach the most
recent crawl snapshot / robots fetch / quote to a page, bucket events
into promo or outage windows).

Reference provenance: fates answers "find the record in effect at time
T" by a linear scan over its sorted record heap (`lib/fates.rb:71-88`,
`detect` over ordered records); these are the distributed equivalents.

Scale shapes (the whole point — neither operator may expand the big
side):

``asof_join`` — the union/carry-forward plan: tag both sides, union,
ONE shuffle on the join key, one window sort per key ordered by
(ts, tag, tiebreak), carry the last non-null right payload forward
(`last(..., ignorenulls=True)` over unboundedPreceding..current), keep
the left rows. No range explosion, no per-left-row probe, no broadcast
requirement on either side: cost is exactly one sort-merge pass, the
same bound as a sort-merge join, and skewed keys cost one partition's
sort bounded by the hottest key (AQE skew split applies). This is the
standard scalable Spark as-of (pandas ``merge_asof`` semantics,
direction="backward"/"forward", allow-exact-matches, optional
tolerance), with an explicit deterministic tie contract so a DuckDB
``ASOF JOIN`` oracle can reproduce it bit-for-bit.

``interval_join`` — bucketized range join: intervals explode to the
fixed-width buckets they cover (``sequence`` of epoch-bucket ids —
bounded by interval_length/width per row), points map to their single
bucket, equi-join on ([key,] bucket), then the exact containment
predicate. Each (point, interval) pair can only meet in the point's one
bucket, so no post-join dedup is needed. The cartesian never appears in
the plan; shuffle volume is |points| + sum(interval spans), both linear.
`bucket_width` trades explode factor vs join selectivity (pick ~ median
interval length; at 100 TB make it hours for day-scale windows).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_TAG = "__asof_tag"
_CARRY = "__asof_carry"
_BUCKET = "__iv_bucket"


def asof_join(left: DataFrame, right: DataFrame, *, on: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: Optional[Sequence[str]] = None,
              direction: str = "backward", allow_exact: bool = True,
              tolerance_us: Optional[int] = None,
              suffix: str = "_right", how: str = "left",
              tiebreak: Optional[str] = None) -> DataFrame:
    """Attach to each left row the nearest-in-time right row per key.

    direction="backward": right_ts <= left_ts (the latest such row);
    "forward": right_ts >= left_ts (the earliest). ``allow_exact=False``
    makes the inequality strict. Ties inside the right side (several
    right rows at one (key, ts)) resolve to the LARGEST ``tiebreak``
    column value (required then — the contract an oracle can replay).
    ``tolerance_us``: matches farther than this many microseconds (in
    integer micros, never float seconds) are nulled (how="left") or
    dropped (how="inner"). Right payload columns arrive as
    ``<col><suffix>`` plus ``<right_ts><suffix>`` for the matched time.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner: {how}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in on and c != right_ts]
    right_cols = list(right_cols)

    # Integer-microsecond event time on both sides: the window ORDER BY
    # and the tolerance compare both run in exact int64, so boundary
    # cases (gap == tolerance, ts == ts) can never disagree with an
    # epoch_us-based oracle.
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    # At equal ts the right row must sort BEFORE the left row so the
    # carry-forward sees it (allow_exact) — or AFTER, to hide it.
    # backward scans time ascending; forward scans descending (so the
    # earliest future row is the last one carried forward).
    r_tag, l_tag = (0, 1) if allow_exact else (2, 1)
    payload = F.struct(*([F.col("__ts_us").alias("__m_us")] +
                         [F.col(c) for c in right_cols]))
    tie = (F.col(tiebreak) if tiebreak is not None else F.lit(0))
    r_side = (right.select(*on, r_us.alias("__ts_us"),
                           tie.alias("__tie"), *right_cols)
              .withColumn(_TAG, F.lit(r_tag))
              .withColumn(_CARRY, payload))
    l_side = (left.withColumn("__ts_us", l_us)
              .withColumn("__tie", F.lit(None).cast(r_side.schema["__tie"]
                                                    .dataType))
              .withColumn(_TAG, F.lit(l_tag))
              .withColumn(_CARRY, F.lit(None).cast(r_side.schema[_CARRY]
                                                   .dataType)))
    keep = [c for c in left.columns]
    u = l_side.select(*keep, "__ts_us", "__tie", _TAG, _CARRY).unionByName(
        r_side.select(*[F.lit(None).cast(l_side.schema[c].dataType).alias(c)
                        for c in keep if c not in on and c != "__ts_us"],
                      *on, "__ts_us", "__tie", _TAG, _CARRY))

    # Scan order: time toward the probe (asc for backward, desc for
    # forward). Tag ASC is right in BOTH directions because the tag
    # values encode exactness: visible right rows (0) sort before left
    # (1), hidden ones (2) after. Dup-ts right ties sort tiebreak ASC so
    # the largest lands nearest the probe and wins the carry.
    asc = direction == "backward"
    order = [F.col("__ts_us").asc() if asc else F.col("__ts_us").desc(),
             F.col(_TAG).asc(), F.col("__tie").asc_nulls_last()]
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (u.withColumn("__m", F.last(_CARRY, ignorenulls=True).over(w))
               .filter(F.col(_TAG) == 1))

    gap = F.abs(F.col("__ts_us") - F.col("__m.__m_us"))
    if tolerance_us is not None:
        matched = matched.withColumn(
            "__m", F.when(gap <= int(tolerance_us), F.col("__m")))
    out = matched.select(
        *keep,
        F.col("__m.__m_us").alias(right_ts + suffix + "_us"),
        *[F.col(f"__m.{c}").alias(c + suffix) for c in right_cols])
    if how == "inner":
        out = out.filter(F.col(right_ts + suffix + "_us").isNotNull())
    return out


def interval_join(points: DataFrame, intervals: DataFrame, *,
                  on: Sequence[str] = (), point_ts: str = "ts",
                  start: str = "start", end: str = "end",
                  end_inclusive: bool = False,
                  bucket_width_us: int = 3_600_000_000,
                  broadcast_intervals: bool = False) -> DataFrame:
    """All (point, interval) pairs with start <= ts < end (or <= end).

    Equi-join on ([key,] time-bucket) — the point sits in exactly one
    bucket, so pairs are produced at most once and no dedup runs. Set
    ``broadcast_intervals=True`` when the interval table is dimension-
    sized (promo calendar, outage log) to skip the shuffle entirely.
    Returns points columns + interval columns (caller pre-projects /
    renames to avoid collisions).
    """
    on = list(on)
    w = int(bucket_width_us)
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start).cast("timestamp"))
    e_us = F.unix_micros(F.col(end).cast("timestamp"))

    # integer `div`, not floor(double /): exact int64 bucket ids; both
    # sides share the (monotonic) expression so pairing can never split
    p = points.withColumn("__p_us", p_us).withColumn(
        _BUCKET, F.expr(f"__p_us div {w}"))
    iv = (intervals.withColumn("__s_us", s_us).withColumn("__e_us", e_us)
          .withColumn(_BUCKET, F.explode(F.sequence(
              F.expr(f"__s_us div {w}"), F.expr(f"__e_us div {w}")))))
    if broadcast_intervals:
        iv = F.broadcast(iv)
    cond = F.col("__p_us") >= F.col("__s_us")
    cond = cond & (F.col("__p_us") <= F.col("__e_us") if end_inclusive
                   else (F.col("__p_us") < F.col("__e_us")))
    joined = p.join(iv, on + [_BUCKET], "inner").filter(cond)
    return joined.drop(_BUCKET, "__p_us", "__s_us", "__e_us")
