"""Geosearch (_geoRadius / _geoBoundingBox / _geoPoint sort) vs a pure-
Python haversine oracle over the deterministic doc-derived coordinates."""

import math
import re

from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE
from grenad_spark.query.geo import (
    EARTH_RADIUS_KM,
    geo_bbox_topk,
    geo_radius_topk,
    geo_sort_topk,
    with_geo,
)

CENTER = (10.0, 20.0)


def _coords(doc_id):
    lat = -60.0 + ((doc_id % 12000) * 7919 % 12000) / 100.0
    lng = -180.0 + ((doc_id % 36000) * 104729 % 36000) / 100.0
    return lat, lng


def _hav(lat, lng, lat0, lng0):
    dphi = math.radians(lat - lat0)
    dlmb = math.radians(lng - lng0)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(math.radians(lat0)) * math.cos(math.radians(lat))
        * math.sin(dlmb / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_with_geo_matches_reference_formula(spark, docs_small):
    rows = with_geo(docs_small).select("doc_id", "lat", "lng").collect()
    assert rows
    for r in rows[:50]:
        lat, lng = _coords(r.doc_id)
        assert (r.lat, r.lng) == (lat, lng)
        assert -60.0 <= r.lat < 60.0 and -180.0 <= r.lng < 180.0


def test_geo_radius_filters_and_refills(spark, docs_small, index_small):
    """Every hit is inside the radius; hits are the top-scoring IN-radius
    docs (out-of-radius docs are skipped, not blanked)."""
    out = geo_radius_topk(
        spark, index_small, docs_small, [(1, "dup")], CENTER, 5000.0, k=10
    ).collect()
    assert out
    toks = {
        r.doc_id: set(re.split(TOKEN_SPLIT_RE, r.text.lower()))
        for r in docs_small.select("doc_id", "text").collect()
    }
    in_radius = {
        d for d in toks
        if round(_hav(*_coords(d), *CENTER), 4) <= 5000.0 and "dup" in toks[d]
    }
    got = {r.doc_id for r in out}
    assert got <= in_radius
    for r in out:
        assert abs(r.dist_km - round(_hav(*_coords(r.doc_id), *CENTER), 4)) < 1e-9


def test_geo_sort_orders_by_distance(spark, docs_small, index_small):
    out = geo_sort_topk(
        spark, index_small, docs_small, [(1, "dup")], CENTER, k=10
    ).collect()
    assert out
    dists = [r.dist_km for r in out]
    assert dists == sorted(dists)


def test_geo_bbox_is_exact_comparisons(spark, docs_small, index_small):
    tl, br = (50.0, -100.0), (-50.0, 100.0)
    out = geo_bbox_topk(
        spark, index_small, docs_small, [(1, "dup")], tl, br, k=10
    ).collect()
    assert out
    for r in out:
        lat, lng = _coords(r.doc_id)
        assert br[0] <= lat <= tl[0] and tl[1] <= lng <= br[1]
