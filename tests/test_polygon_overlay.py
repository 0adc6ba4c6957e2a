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
