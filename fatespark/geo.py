"""Geo search — ES ``geo_distance`` / ``geo_bounding_box`` /
``geotile_grid`` over (lat, lon) columns.

Float determinism across engines is the design driver: great-circle
ORDERING never touches floats.  Each point maps to a quantized
unit-sphere integer coordinate

    gx = floor(cos(latr) * cos(lonr) * S)
    gy = floor(cos(latr) * sin(lonr) * S)
    gz = floor(sin(latr) * S)              (S = 10^6)

and nearest-neighbor ranking sorts by the INT64 squared chord
``(gx-gx')^2 + (gy-gy')^2 + (gz-gz')^2`` (monotone in great-circle
distance) with doc-id ties — exact integer arithmetic end-to-end.
``radians`` is spelled as one shared literal multiply (no engine
``radians()`` builtin), and ``floor`` absorbs libm's <= 1-2 ulp
sin/cos differences (collision needs a value within ~2e-16 of a
1/S boundary — negligible, and a flip would surface as a hash
mismatch, never silently).  The REPORTED meters column is derived
from the integer chord (``2 R asin(chord/(2S))``) and rounded after
ordering, the ann_topk convention.

- ``geo_bounding_box``: pure comparisons; ``lon_min > lon_max`` means
  the box crosses the antimeridian and matches with OR-wrap (the ES
  contract).
- ``geotile_cell``: Web-Mercator z/x/y slippy-tile key (ES
  ``geotile_grid``): x = floor((lon+180)/360 * 2^z), y from the
  Mercator formula, both clamped to [0, 2^z-1]; cells aggregate with
  one combinable count.

100 TB shape: the quantized coords are narrow JVM projections
(precompute them once as stored columns at build time and the
distance query never touches trig); top-k is a k-bounded
TakeOrderedAndProject; bbox is a pushable range predicate on stored
lat/lon columns; the grid agg shuffles one (cell, count) pair per
map-side-combined cell.  For web-scale serving, prune by coarse tile
prefix first (the standard grid pre-filter), then chord-rank inside
the candidate tiles.

Reference analogue: none (fates is text-only) — target-new, the ES
geo serving surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RAD = 0.017453292519943295       # pi / 180, one shared literal
S = 1_000_000                    # unit-sphere quantization scale
R_EARTH = 6_371_000.0            # meters

__all__ = ["geo_point_cols", "geo_distance_topk", "geo_bounding_box",
           "geotile_cell", "geotile_grid", "geo_distance_sql",
           "geo_bbox_sql", "geotile_grid_sql"]


def geo_point_cols(lat_col, lon_col):
    """(gx, gy, gz) quantized unit-sphere int columns."""
    lat = (F.col(lat_col) if isinstance(lat_col, str) else lat_col) \
        .cast("double")
    lon = (F.col(lon_col) if isinstance(lon_col, str) else lon_col) \
        .cast("double")
    latr, lonr = lat * F.lit(RAD), lon * F.lit(RAD)
    gx = F.floor(F.cos(latr) * F.cos(lonr) * F.lit(float(S)))
    gy = F.floor(F.cos(latr) * F.sin(lonr) * F.lit(float(S)))
    gz = F.floor(F.sin(latr) * F.lit(float(S)))
    return gx, gy, gz


def _chord2(gx, gy, gz, qx: int, qy: int, qz: int):
    return ((gx - F.lit(qx)) * (gx - F.lit(qx))
            + (gy - F.lit(qy)) * (gy - F.lit(qy))
            + (gz - F.lit(qz)) * (gz - F.lit(qz)))


def quantize_point(lat: float, lon: float) -> tuple[int, int, int]:
    """Driver-side twin of geo_point_cols for the query point."""
    import math
    latr, lonr = lat * RAD, lon * RAD
    return (math.floor(math.cos(latr) * math.cos(lonr) * float(S)),
            math.floor(math.cos(latr) * math.sin(lonr) * float(S)),
            math.floor(math.sin(latr) * float(S)))


def geo_distance_topk(df: DataFrame, lat: float, lon: float, k: int = 10,
                      *, id_col: str = "doc_id", lat_col: str = "lat",
                      lon_col: str = "lon") -> DataFrame:
    """(id, chord2, dist_m): k nearest points to (lat, lon), ordered by
    the exact integer squared chord (ties by id); dist_m is the derived
    great-circle meters, rounded AFTER ordering."""
    qx, qy, qz = quantize_point(lat, lon)
    gx, gy, gz = geo_point_cols(lat_col, lon_col)
    c2 = _chord2(gx, gy, gz, qx, qy, qz).cast("long")
    out = (df.select(F.col(id_col), c2.alias("chord2"))
           .orderBy(F.asc("chord2"), F.asc(id_col)).limit(k))
    dist = (F.lit(2.0 * R_EARTH)
            * F.asin(F.sqrt(F.col("chord2").cast("double"))
                     / F.lit(2.0 * float(S))))
    return out.select(id_col, "chord2", F.round(dist, 1).alias("dist_m"))


def geo_bounding_box(df: DataFrame, lat_min: float, lat_max: float,
                     lon_min: float, lon_max: float, *,
                     lat_col: str = "lat", lon_col: str = "lon"
                     ) -> DataFrame:
    """Rows inside the box.  lon_min > lon_max = the box crosses the
    antimeridian: match lon >= lon_min OR lon <= lon_max (ES)."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    cond = (lat >= F.lit(lat_min)) & (lat <= F.lit(lat_max))
    if lon_min <= lon_max:
        cond &= (lon >= F.lit(lon_min)) & (lon <= F.lit(lon_max))
    else:
        cond &= (lon >= F.lit(lon_min)) | (lon <= F.lit(lon_max))
    return df.filter(cond)


def geotile_cell(lat_col, lon_col, zoom: int):
    """'z/x/y' Web-Mercator tile key column (ES geotile_grid bucket
    key).  Latitudes beyond the Mercator range clamp to the edge tile,
    lon=180 clamps to 2^z - 1 — the slippy-map contract."""
    if not 0 <= zoom <= 29:
        raise ValueError("zoom must be in [0, 29]")
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    lat = (F.col(lat_col) if isinstance(lat_col, str) else lat_col) \
        .cast("double")
    lon = (F.col(lon_col) if isinstance(lon_col, str) else lon_col) \
        .cast("double")
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    latr = lat * F.lit(RAD)
    merc = F.log(F.tan(latr) + F.lit(1.0) / F.cos(latr))
    y = F.floor((F.lit(1.0) - merc / F.lit(3.141592653589793))
                / F.lit(2.0) * F.lit(n))
    clamp = lambda c: F.least(F.lit(hi).cast("long"),
                              F.greatest(F.lit(0).cast("long"),
                                         c.cast("long")))
    return F.concat_ws("/", F.lit(str(zoom)), clamp(x).cast("string"),
                       clamp(y).cast("string"))


def geotile_grid(df: DataFrame, zoom: int, *, lat_col: str = "lat",
                 lon_col: str = "lon") -> DataFrame:
    """(cell, n) — ES geotile_grid: one map-side-combinable count per
    tile."""
    return (df.select(geotile_cell(lat_col, lon_col, zoom).alias("cell"))
            .groupBy("cell").agg(F.count("*").alias("n")))


# --------------------------------------------------------------------------
# DuckDB twins — identical expression trees
# --------------------------------------------------------------------------

def _g_sql(lat: str, lon: str) -> tuple[str, str, str]:
    latr = f"(CAST({lat} AS DOUBLE) * {RAD!r})"
    lonr = f"(CAST({lon} AS DOUBLE) * {RAD!r})"
    return (f"CAST(floor(cos({latr}) * cos({lonr}) * {float(S)!r}) AS BIGINT)",
            f"CAST(floor(cos({latr}) * sin({lonr}) * {float(S)!r}) AS BIGINT)",
            f"CAST(floor(sin({latr}) * {float(S)!r}) AS BIGINT)")


def geo_distance_sql(src: str, lat: float, lon: float, k: int = 10, *,
                     id_col: str = "doc_id", lat_col: str = "lat",
                     lon_col: str = "lon") -> str:
    qx, qy, qz = quantize_point(lat, lon)
    gx, gy, gz = _g_sql(lat_col, lon_col)
    return f"""
WITH pts AS (
  SELECT {id_col}, {gx} AS gx, {gy} AS gy, {gz} AS gz FROM {src}
),
nn AS (
  SELECT {id_col},
         (gx - {qx}) * (gx - {qx}) + (gy - {qy}) * (gy - {qy})
         + (gz - {qz}) * (gz - {qz}) AS chord2
  FROM pts
  ORDER BY chord2 ASC, {id_col} ASC LIMIT {k}
)
SELECT {id_col}, chord2,
       round({2.0 * R_EARTH!r}
             * asin(sqrt(CAST(chord2 AS DOUBLE)) / {2.0 * float(S)!r}),
             1) AS dist_m
FROM nn ORDER BY chord2 ASC, {id_col} ASC"""


def geo_bbox_sql(src: str, lat_min: float, lat_max: float, lon_min: float,
                 lon_max: float, *, lat_col: str = "lat",
                 lon_col: str = "lon") -> str:
    if lon_min <= lon_max:
        lc = f"{lon_col} >= {lon_min!r} AND {lon_col} <= {lon_max!r}"
    else:
        lc = f"({lon_col} >= {lon_min!r} OR {lon_col} <= {lon_max!r})"
    return (f"SELECT * FROM {src} WHERE {lat_col} >= {lat_min!r} "
            f"AND {lat_col} <= {lat_max!r} AND {lc}")


def geotile_grid_sql(src: str, zoom: int, *, lat_col: str = "lat",
                     lon_col: str = "lon") -> str:
    n, hi = float(1 << zoom), (1 << zoom) - 1
    latr = f"(CAST({lat_col} AS DOUBLE) * {RAD!r})"
    x = f"floor((CAST({lon_col} AS DOUBLE) + 180.0) / 360.0 * {n!r})"
    merc = f"ln(tan({latr}) + 1.0 / cos({latr}))"
    y = f"floor((1.0 - {merc} / {3.141592653589793!r}) / 2.0 * {n!r})"
    clamp = lambda c: (f"least(CAST({hi} AS BIGINT), "
                       f"greatest(CAST(0 AS BIGINT), CAST({c} AS BIGINT)))")
    return f"""
SELECT '{zoom}' || '/' || CAST({clamp(x)} AS VARCHAR) || '/'
       || CAST({clamp(y)} AS VARCHAR) AS cell,
       count(*) AS n
FROM {src} GROUP BY cell"""
