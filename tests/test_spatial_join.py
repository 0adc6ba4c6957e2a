from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoclimate_spark import geometry, grid
from geoclimate_spark.functions.extract import with_extraction
from geoclimate_spark.operators.spatial_join import (
    pick_cover_res, spatial_join_points, spatial_join_points_np)
from geoclimate_spark.sources import layers
from geoclimate_spark.sources.pages import pages_from_documents

from conftest import SF_SMOKE


def _geo_pages(spark):
    pages = pages_from_documents(spark, SF_SMOKE)
    return with_extraction(pages).where(F.col("lon_e6").isNotNull()) \
        .select("page_id", "lon_e6", "lat_e6")


def test_climate_zone_join_matches_numpy_oracle(spark):
    g = _geo_pages(spark)
    zones = layers.climate_zones()
    got = spatial_join_points(g, zones).orderBy("page_id").toPandas()
    src = g.orderBy("page_id").toPandas()
    want = spatial_join_points_np(src.lon_e6.values, src.lat_e6.values, zones)
    # climate zones tile the globe: every geo page matches
    assert len(got) == len(src)
    assert (got.zone_id.values == want[want >= 0]).all()


def test_voronoi_zone_join_matches_numpy_oracle(spark):
    """The generic convex-polygon path (non-SQL-expressible); overlaps and
    gaps exercise tie-break + unmatched-row semantics."""
    g = _geo_pages(spark)
    zones = layers.voronoi_zones(n=40, seed=42)
    got = spatial_join_points(g, zones).orderBy("page_id").toPandas()
    src = g.orderBy("page_id").toPandas()
    want = spatial_join_points_np(src.lon_e6.values, src.lat_e6.values, zones)
    matched = src[want >= 0]
    assert len(got) == len(matched)
    assert (got.page_id.values == matched.page_id.values).all()
    assert (got.zone_id.values == want[want >= 0]).all()
    # gaps exist (not every page matched) at this zone density
    assert len(got) < len(src)


def test_boundary_point_lowest_zone_id_tiebreak(spark):
    """Point exactly on a shared boundary → lowest zone id (reference
    convention, RsuIndicators.groovy:955-957)."""
    zones = [
        layers.Zone(7, "b", geometry.rect_poly(0.0, 0.0, 1.0, 1.0)),
        layers.Zone(3, "a", geometry.rect_poly(1.0, 0.0, 2.0, 1.0)),
    ]
    pdf = pd.DataFrame({
        "page_id": [1, 2, 3],
        "lon_e6": [1_000_000, 500_000, 1_500_000],  # on boundary, in z7, in z3
        "lat_e6": [500_000, 500_000, 500_000],
    })
    df = spark.createDataFrame(pdf)
    got = spatial_join_points(df, zones, res=8).orderBy("page_id").toPandas()
    assert got.zone_id.tolist() == [3, 7, 3]


def test_overlapping_zones_lowest_id_wins(spark):
    zones = [
        layers.Zone(5, "big", geometry.rect_poly(0.0, 0.0, 2.0, 2.0)),
        layers.Zone(2, "inner", geometry.rect_poly(0.5, 0.5, 1.5, 1.5)),
    ]
    pdf = pd.DataFrame({"page_id": [1, 2],
                        "lon_e6": [1_000_000, 100_000],
                        "lat_e6": [1_000_000, 100_000]})
    got = spatial_join_points(spark.createDataFrame(pdf), zones, res=8) \
        .orderBy("page_id").toPandas()
    assert got.zone_id.tolist() == [2, 5]


def test_full_cell_fast_path_consistency(spark):
    """Coarse vs fine covering resolutions must agree (full-cell shortcut is
    semantics-free)."""
    g = _geo_pages(spark).limit(200)
    zones = layers.voronoi_zones(n=10, seed=1)
    a = spatial_join_points(g, zones, res=4).orderBy("page_id").toPandas()
    b = spatial_join_points(g, zones, res=8).orderBy("page_id").toPandas()
    assert a.page_id.tolist() == b.page_id.tolist()
    assert a.zone_id.tolist() == b.zone_id.tolist()


def test_rect_fast_path_equals_generic_refine(spark):
    """The zero-shuffle rect path and the explode+ray-cast path must be
    bit-equivalent on rect zones — including boundary ties and overlaps."""
    g = _geo_pages(spark)
    zones = layers.climate_zones()
    fast = spatial_join_points(g, zones).orderBy("page_id").toPandas()
    slow = spatial_join_points(g, zones, force_generic=True) \
        .orderBy("page_id").toPandas()
    assert fast.page_id.tolist() == slow.page_id.tolist()
    assert fast.zone_id.tolist() == slow.zone_id.tolist()
    # and the fast plan really is UDF-free + shuffle-free
    plan = spatial_join_points(g, zones)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_rect_fast_path_requires_grid_aligned_edges(spark):
    """A rectangle whose edge is NOT on the µ° grid must fall back to the
    generic path (the integer comparison would disagree inside the snap
    gap)."""
    from geoclimate_spark.operators.spatial_join import _rect_bounds_e6
    ok = layers.Zone(1, "a", geometry.rect_poly(0.0, 0.0, 1.0, 1.0))
    off = layers.Zone(2, "b", geometry.rect_poly(0.00000042, 0.0, 1.0, 1.0))
    assert _rect_bounds_e6([ok]) == {1: (0, 0, 1_000_000, 1_000_000)}
    assert _rect_bounds_e6([ok, off]) is None
    tri = layers.Zone(3, "c", np.array([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]]))
    assert _rect_bounds_e6([tri]) is None


def test_pick_cover_res_budget():
    zones = layers.climate_zones()
    res = pick_cover_res(zones, max_cells=20_000)
    cells, _, _ = layers.zone_covering(zones, res)
    assert len(cells) <= 20_000
    assert res >= 2


def test_zone_covering_full_flags():
    zones = [layers.Zone(0, "t", geometry.rect_poly(0.0, 0.0, 10.0, 10.0))]
    cells, zids, fulls = layers.zone_covering(zones, 6)
    # interior cells flagged full, boundary cells not
    lo0, la0, lo1, la1 = grid.cell_bounds_np(cells)
    interior = (lo0 >= 0) & (lo1 <= 10) & (la0 >= 0) & (la1 <= 10)
    assert (fulls == interior).all()
