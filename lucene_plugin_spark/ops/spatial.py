"""Geo-spatial search operators — the lucene-spatial module family (the
Lucene 5.2 line this engine tracks ships point/distance strategies over an
``IndexReader``; the reference service itself bundles only lucene-core,
analyzers-common and queryparser — service/build.gradle:13-15 — so this
covers the module family the way classify.py does, not a reference
classpath item).  Here the same queries run over (lat, lon) DOUBLE columns
with DataFrame built-ins.

Scale design: every distance query is a two-stage plan —

1. a SARGABLE bounding-box prefilter (four range predicates, plus an OR of
   two longitude ranges when the box crosses the antimeridian) that reaches
   the parquet scan as ``PushedFilters`` when lat/lon are stored columns —
   the columnar analogue of the prefix-tree grid prune Lucene's
   RecursivePrefixTreeStrategy does;
2. the exact haversine great-circle distance on the surviving rows only
   (pure JVM trig inside whole-stage codegen, no Python).

The box uses the exact formulae (Jan Matuschek, "Finding Points Within a
Distance of a Latitude/Longitude"): Δlat = r/R;
Δlon = asin(sin(r/R)/cos(lat)) — NOT the r/(R·cos lat) approximation,
which under-covers near the box corners — and degrades to the full
longitude range when the circle reaches a pole.  The box is therefore a
strict superset of the circle: the prefilter can never drop an in-radius
point.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: IUGG mean earth radius, km (the value lucene-spatial's GeoDistanceUtils
#: family also centres on)
EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column,
                 lon2: Column) -> Column:
    """Great-circle distance in km between two (degree) coordinate pairs —
    column expression, stays in whole-stage codegen."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2.0
    dl = F.radians(lon2 - lon1) / 2.0
    a = (F.sin(dp) * F.sin(dp)
         + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl))
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def bounding_box(lat0: float, lon0: float, radius_km: float
                 ) -> tuple[float, float, float, float, bool]:
    """(lat_min, lat_max, lon_min, lon_max, wraps): the smallest
    lat/lon-aligned box containing the radius circle.  ``wraps`` means the
    longitude window crosses the antimeridian and must be evaluated as
    ``lon >= lon_min OR lon <= lon_max``."""
    if radius_km < 0:
        raise ValueError(f"radius must be >= 0, got {radius_km}")
    r = radius_km / EARTH_RADIUS_KM          # angular radius
    lat = math.radians(lat0)
    lat_min, lat_max = lat - r, lat + r
    if lat_min <= math.radians(-90.0) or lat_max >= math.radians(90.0):
        # circle reaches a pole: every longitude is inside
        return (max(-90.0, math.degrees(lat_min)),
                min(90.0, math.degrees(lat_max)), -180.0, 180.0, False)
    dlon = math.asin(min(1.0, math.sin(r) / math.cos(lat)))
    lon_min = math.degrees(math.radians(lon0) - dlon)
    lon_max = math.degrees(math.radians(lon0) + dlon)
    wraps = False
    if lon_min < -180.0:
        lon_min += 360.0
        wraps = True
    if lon_max > 180.0:
        lon_max -= 360.0
        wraps = True
    return (math.degrees(lat_min), math.degrees(lat_max),
            lon_min, lon_max, wraps)


def geo_bbox(df: DataFrame, lat_col: str, lon_col: str, lat_min: float,
             lat_max: float, lon_min: float, lon_max: float,
             wraps: bool = False) -> DataFrame:
    """Rows inside a lat/lon box — four sargable range predicates (two
    OR'd longitude ranges when ``wraps``), all pushable to the scan."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    cond = (lat >= F.lit(float(lat_min))) & (lat <= F.lit(float(lat_max)))
    if wraps:
        cond = cond & ((lon >= F.lit(float(lon_min)))
                       | (lon <= F.lit(float(lon_max))))
    else:
        cond = cond & (lon >= F.lit(float(lon_min))) \
            & (lon <= F.lit(float(lon_max)))
    return df.where(cond)


def geo_distance_search(df: DataFrame, lat_col: str, lon_col: str,
                        lat0: float, lon0: float, radius_km: float,
                        limit: int | None = None) -> DataFrame:
    """Rows within ``radius_km`` of (lat0, lon0) with a ``distance_km``
    column — bbox prune then exact haversine; ``limit`` adds the
    distance-sorted top-k cut (ties on ascending row order of the
    remaining columns are the caller's concern; pass ``None`` for the
    full untruncated match set)."""
    box = bounding_box(float(lat0), float(lon0), float(radius_km))
    pruned = geo_bbox(df, lat_col, lon_col, *box)
    dist = haversine_km(F.col(lat_col), F.col(lon_col),
                        F.lit(float(lat0)), F.lit(float(lon0)))
    out = (pruned.withColumn("distance_km", dist)
           .where(F.col("distance_km") <= F.lit(float(radius_km))))
    if limit is not None:
        out = out.orderBy(F.asc("distance_km")).limit(int(limit))
    return out
