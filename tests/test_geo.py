"""Geo: quantized-chord ranking vs brute haversine, bbox wrap, geotile."""

import math

import pytest
from pyspark.sql import functions as F

from fatespark.geo import (RAD, S, geo_bounding_box, geo_distance_topk,
                           geo_point_cols, geotile_cell, geotile_grid,
                           quantize_point)

PTS = [
    (1, 47.0, 9.0), (2, 47.1, 9.1), (3, -33.9, 151.2), (4, 40.7, -74.0),
    (5, 0.0, 0.0), (6, 89.0, 10.0), (7, -89.0, 10.0), (8, 20.0, 180.0),
    (9, 20.0, -180.0), (10, 10.0, 175.0), (11, 10.0, -175.0),
    (12, 46.9, 8.9), (13, 47.0, 9.0001), (14, -30.0, 170.0),
    (15, 30.0, -170.0), (16, 85.06, 0.0), (17, -85.06, 0.0),
]


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        PTS, "doc_id long, lat double, lon double").cache()


def haversine_m(lat1, lon1, lat2, lon2):
    p1, p2 = lat1 * RAD, lat2 * RAD
    dp, dl = (lat2 - lat1) * RAD, (lon2 - lon1) * RAD
    a = math.sin(dp / 2) ** 2 \
        + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * 6_371_000.0 * math.asin(math.sqrt(a))


def brute_chord2(lat, lon, qlat, qlon):
    g = quantize_point(lat, lon)
    q = quantize_point(qlat, qlon)
    return sum((a - b) ** 2 for a, b in zip(g, q))


def test_point_cols_match_python_twin(pts):
    rows = pts.select("doc_id", *[c.alias(n) for c, n in zip(
        geo_point_cols("lat", "lon"), ("gx", "gy", "gz"))]).collect()
    for r in rows:
        lat, lon = dict((p[0], p[1:]) for p in PTS)[r["doc_id"]]
        assert (r["gx"], r["gy"], r["gz"]) == quantize_point(lat, lon)


def test_distance_topk_matches_brute(pts):
    got = geo_distance_topk(pts, 47.0, 9.0, k=5).collect()
    want = sorted(PTS, key=lambda p: (brute_chord2(p[1], p[2], 47.0, 9.0),
                                      p[0]))[:5]
    assert [r["doc_id"] for r in got] == [p[0] for p in want]
    assert got[0]["doc_id"] == 1 and got[0]["chord2"] == 0
    for r in got:
        assert r["chord2"] == brute_chord2(
            *dict((p[0], p[1:]) for p in PTS)[r["doc_id"]], 47.0, 9.0)
        # reported meters track true haversine within quantization error
        lat, lon = dict((p[0], p[1:]) for p in PTS)[r["doc_id"]]
        assert r["dist_m"] == pytest.approx(
            haversine_m(lat, lon, 47.0, 9.0), abs=25.0)


def test_chord_order_is_haversine_order(pts):
    """Chord rank == haversine rank except where two points sit within
    the chord quantization granularity (~2R/S = 12.7 m): those tie in
    chord2 and fall back to id order — the documented contract (docs 1
    and 13 are 1.7 m apart and exercise exactly that branch)."""
    got = [r["doc_id"] for r in geo_distance_topk(pts, 10.0, 178.0,
                                                  k=len(PTS)).collect()]
    by_id = dict((p[0], p[1:]) for p in PTS)
    hv = {i: haversine_m(*by_id[i], 10.0, 178.0) for i in by_id}
    for a, b in zip(got, got[1:]):
        # every adjacent pair is either in haversine order or within the
        # quantization granularity (then id-ordered)
        assert hv[a] <= hv[b] + 20.0
        if hv[a] > hv[b]:
            assert a < b
    assert set(got) == set(hv)


def test_bbox_plain_and_wrap(pts):
    plain = {r["doc_id"] for r in
             geo_bounding_box(pts, 40.0, 50.0, 8.0, 10.0).collect()}
    assert plain == {1, 2, 12, 13}
    wrap = {r["doc_id"] for r in
            geo_bounding_box(pts, -30.0, 30.0, 170.0, -170.0).collect()}
    # antimeridian box: lon >= 170 OR lon <= -170, lat in [-30, 30]
    assert wrap == {8, 9, 10, 11, 14, 15}


def test_geotile_cell_reference(pts):
    def ref(lat, lon, z):
        n = 1 << z
        x = math.floor((lon + 180.0) / 360.0 * float(n))
        latr = lat * RAD
        merc = math.log(math.tan(latr) + 1.0 / math.cos(latr))
        y = math.floor((1.0 - merc / math.pi) / 2.0 * float(n))
        c = lambda v: min(n - 1, max(0, v))
        return f"{z}/{c(x)}/{c(y)}"
    rows = pts.select("doc_id", geotile_cell("lat", "lon", 4)
                      .alias("cell")).collect()
    for r in rows:
        lat, lon = dict((p[0], p[1:]) for p in PTS)[r["doc_id"]]
        assert r["cell"] == ref(lat, lon, 4), (r["doc_id"], lat, lon)
    by = {r["doc_id"]: r["cell"] for r in rows}
    assert by[8] == "4/15/7" and by[9] == "4/0/7"   # lon 180 clamps to hi
    assert by[6].endswith("/0") and by[7].endswith("/15")  # polar clamp


def test_geotile_grid_counts(pts):
    got = {r["cell"]: r["n"] for r in geotile_grid(pts, 4).collect()}
    from collections import Counter
    rows = pts.select(geotile_cell("lat", "lon", 4).alias("c")).collect()
    want = Counter(r["c"] for r in rows)
    assert got == dict(want)
    assert sum(got.values()) == len(PTS)


def test_distance_plan_bounded(pts):
    plan = geo_distance_topk(pts, 0.0, 0.0, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_zoom_validation(pts):
    with pytest.raises(ValueError):
        geotile_cell("lat", "lon", 30)
