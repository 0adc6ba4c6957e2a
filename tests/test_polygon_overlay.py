"""Geometric truth of the relational convex-polygon overlay.

The driver/test_entry gate proves Spark == DuckDB; these tests prove both
equal the GEOMETRY by checking every pair against the independent numpy
Sutherland–Hodgman clipper (geometry.clip_convex), plus invariants.
"""

from __future__ import annotations

import numpy as np
import pytest

from geoclimate_spark import geometry
from geoclimate_spark.operators import polygon_overlay
from geoclimate_spark.sources import layers


def _polys(rows, key_idx, xy_idx):
    out = {}
    for r in rows:
        out.setdefault(r[key_idx], []).append((r[xy_idx], r[xy_idx + 1]))
    return {k: np.asarray(v, np.float64) for k, v in out.items()}


ZP = _polys(layers.synth_poly_zone_rows(), 0, 2)
FP = _polys(layers.synth_poly_feature_rows(), 0, 3)


@pytest.fixture(scope="module")
def pairs(spark):
    df = polygon_overlay.convex_pair_areas(
        layers.poly_zone_vertices_df(spark),
        layers.poly_feature_vertices_df(spark))
    return {(r.zone_id, r.feat_id): r for r in df.collect()}


def test_fixture_polys_are_strictly_convex_ccw():
    for poly in list(ZP.values()) + list(FP.values()):
        n = len(poly)
        assert n >= 3
        for i in range(n):
            a, b, c = poly[i], poly[(i + 1) % n], poly[(i + 2) % n]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            assert cross > 0  # strictly convex, CCW, no collinear triples


def test_pair_areas_match_numpy_clipper(pairs):
    """Every engine pair area equals the Sutherland–Hodgman clip area, and
    no positive-area pair is missed."""
    seen = set(pairs)
    expected = set()
    for zid, zp in ZP.items():
        for fid, fp in FP.items():
            clipped = geometry.clip_convex(fp, zp)
            area = geometry.poly_area(clipped) if len(clipped) >= 3 else 0.0
            if area > 1.0:  # clearly-positive intersections must be found
                expected.add((zid, fid))
                assert (zid, fid) in pairs, (zid, fid)
                got = pairs[(zid, fid)].inter_area
                assert got == pytest.approx(area, rel=1e-9), (zid, fid)
    # engine may legitimately report sub-unit sliver pairs; nothing else
    for key in seen - expected:
        assert pairs[key].inter_area <= 1.0 or key in expected


def test_pair_area_bounded_by_both_polygons(pairs):
    for (zid, fid), r in pairs.items():
        assert 0 < r.inter_area <= geometry.poly_area(ZP[zid]) + 1e-6
        assert r.inter_area <= geometry.poly_area(FP[fid]) + 1e-6


def test_containment_pairs_equal_feature_area(pairs):
    """Features fully inside a zone must intersect at exactly their own
    (exact integer-shoelace) area — exercises the A/B vertex paths."""
    n_contained = 0
    for zid, zp in ZP.items():
        for fid, fp in FP.items():
            if geometry.points_in_polygon(fp[:, 0], fp[:, 1], zp).all():
                n_contained += 1
                assert pairs[(zid, fid)].inter_area == pytest.approx(
                    geometry.poly_area(fp), rel=1e-12)
    assert n_contained >= 3  # fixture actually exercises containment


NC_RING_SCHEMA = "zone_id long, seq long, x long, y long"
NC_FEAT_SCHEMA = "feat_id long, layer string, seq long, x long, y long"


def test_simple_poly_pairs_match_numpy_decomposition(spark):
    """Engine SH areas over the concave fixture == numpy part-clip sums."""
    pairs = polygon_overlay.simple_poly_pair_areas(
        layers.nc_zone_ring_df(spark), layers.poly_feature_vertices_df(spark))
    got = {(r.zone_id, r.feat_id): r.inter_area for r in pairs.collect()}
    _, part_rows = layers._synth_nc_zone_data()
    P = {}
    for z, p, s, x, y in part_rows:
        P.setdefault(z, {}).setdefault(p, []).append((x, y))
    import math
    n_checked = 0
    for (zid, fid), area in got.items():
        fp = FP[fid]
        total = sum(
            geometry.poly_area(c) if len(
                c := geometry.clip_convex(np.asarray(pts, np.float64), fp)) >= 3
            else 0.0
            for pts in P[zid].values())
        assert area == math.floor(total / 1000.0 + 0.5) * 1000.0, (zid, fid)
        n_checked += 1
    assert n_checked > 30


def test_simple_poly_disconnected_intersection_area(spark):
    """U-shaped zone × bar feature: the intersection is TWO disjoint
    pieces; the SH bridge artifact must not perturb the area."""
    u = [(0, 0), (30, 0), (30, 30), (20, 30), (20, 10), (10, 10),
         (10, 30), (0, 30)]
    u = [(x * 1000, y * 1000) for x, y in u]
    arr = np.asarray(u, np.float64)
    sgn = (np.dot(arr[:, 0], np.roll(arr[:, 1], -1))
           - np.dot(arr[:, 1], np.roll(arr[:, 0], -1)))
    if sgn < 0:
        u = u[::-1]
    zv = spark.createDataFrame(
        [(0, i, x, y) for i, (x, y) in enumerate(u)], NC_RING_SCHEMA)
    bar = [(-5, 20), (35, 20), (35, 25), (-5, 25)]
    fv = spark.createDataFrame(
        [(0, "bar", i, x * 1000, y * 1000) for i, (x, y) in enumerate(bar)],
        NC_FEAT_SCHEMA)
    out = polygon_overlay.simple_poly_pair_areas(zv, fv).collect()
    assert len(out) == 1
    # two arms of width 10, bar height 5 (scaled by 1000 each axis)
    assert out[0].inter_area == 2 * (10 * 5) * 1_000_000
