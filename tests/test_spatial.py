"""lucene-spatial analogue (ops/spatial.py): exact-haversine brute force vs
the bbox-pruned plan, bounding-box superset property (incl. antimeridian
wrap and pole degradation), and predicate pushdown of the box when lat/lon
are stored parquet columns.
"""

import math

import pytest

from lucene_plugin_spark.ops import spatial as S


def _py_haversine(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1) / 2.0
    dl = math.radians(lon2 - lon1) / 2.0
    a = (math.sin(dp) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2)
    return 2.0 * S.EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def _points(n=800):
    # deterministic pseudo-uniform global scatter, incl. near-pole and
    # near-antimeridian points
    return [(i,
             (i * 9973 % 18001) / 100.0 - 90.0,
             (i * 7919 % 36000) / 100.0 - 180.0)
            for i in range(n)]


CASES = [
    (42.3, 12.5, 1500.0),          # mid-latitude
    (0.0, 0.0, 3000.0),            # equator
    (65.0, 179.5, 2000.0),         # high latitude + antimeridian wrap
    (-88.0, 10.0, 1000.0),         # circle contains the south pole
    (10.0, -179.9, 500.0),         # wrap the other way
]


@pytest.mark.parametrize("lat0,lon0,r", CASES)
def test_distance_search_vs_bruteforce(spark, lat0, lon0, r):
    pts = _points()
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {row["id"]: row["distance_km"]
           for row in S.geo_distance_search(df, "lat", "lon", lat0, lon0,
                                            r).collect()}
    want = {i: _py_haversine(lat, lon, lat0, lon0)
            for i, lat, lon in pts
            if _py_haversine(lat, lon, lat0, lon0) <= r}
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i] - want[i]) < 1e-9
    assert got, "every case must match at least one point"


@pytest.mark.parametrize("lat0,lon0,r", CASES)
def test_bbox_is_superset_of_circle(lat0, lon0, r):
    lat_min, lat_max, lon_min, lon_max, wraps = S.bounding_box(lat0, lon0, r)
    for i, lat, lon in _points(2000):
        if _py_haversine(lat, lon, lat0, lon0) <= r:
            assert lat_min - 1e-9 <= lat <= lat_max + 1e-9, (lat, lon)
            if wraps:
                assert lon >= lon_min - 1e-9 or lon <= lon_max + 1e-9
            else:
                assert lon_min - 1e-9 <= lon <= lon_max + 1e-9


def test_pole_degrades_to_full_lon():
    lat_min, lat_max, lon_min, lon_max, wraps = S.bounding_box(89.0, 50.0,
                                                               500.0)
    assert lat_max == 90.0 and (lon_min, lon_max) == (-180.0, 180.0)
    assert not wraps
    with pytest.raises(ValueError):
        S.bounding_box(0.0, 0.0, -1.0)


def test_topk_cut(spark):
    pts = _points()
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    full = S.geo_distance_search(df, "lat", "lon", 42.3, 12.5, 4000.0)
    top5 = S.geo_distance_search(df, "lat", "lon", 42.3, 12.5, 4000.0,
                                 limit=5).collect()
    want = sorted(full.collect(), key=lambda r: r["distance_km"])[:5]
    assert [r["id"] for r in top5] == [r["id"] for r in want]


def test_bbox_predicates_pushed_to_parquet(spark, tmp_path):
    """With STORED lat/lon columns the box reaches the scan as
    PushedFilters — the grid-prune analogue the module is designed
    around."""
    p = str(tmp_path / "pts.parquet")
    spark.createDataFrame(_points(), "id long, lat double, lon double") \
        .write.parquet(p)
    df = spark.read.parquet(p)
    plan = S.geo_distance_search(df, "lat", "lon", 42.3, 12.5, 1500.0) \
        ._jdf.queryExecution().executedPlan().toString()
    # the plan string elides long filter lists — assert the box's lat range
    # visibly reached PushedFilters (lon is in the same elided list)
    assert "PushedFilters: [IsNotNull(lat), IsNotNull(lon), " \
           "GreaterThanOrEqual(lat" in plan
    assert "(lon#" in plan  # lon range present in the data filters
