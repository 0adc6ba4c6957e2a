"""Ways→rings assembly — closed/open/degenerate/out-of-order cases."""

from __future__ import annotations

from geoclimate_spark.sources import assembly


def _parts(spark, rows):
    return spark.createDataFrame(rows, "way_id long, seq long, x long, y long")


def test_open_way_ring_closed(spark):
    """Unit square given open and OUT OF ORDER: assembly must sort by seq,
    close the ring, and get area2 = 2*100, perimeter = 40."""
    rows = [(1, 2, 10, 10), (1, 0, 0, 0), (1, 1, 10, 0), (1, 3, 0, 10)]
    out = assembly.assemble_rings(_parts(spark, rows)).toPandas().iloc[0]
    assert out.n_parts == 4 and out.n_ring_points == 5
    assert out.area2_e6sq == 200 and out.perim_floor_e6 == 40


def test_closed_way_not_double_closed(spark):
    rows = [(1, 0, 0, 0), (1, 1, 10, 0), (1, 2, 10, 10), (1, 3, 0, 10),
            (1, 4, 0, 0)]
    out = assembly.assemble_rings(_parts(spark, rows)).toPandas().iloc[0]
    assert out.n_parts == 5 and out.n_ring_points == 5
    assert out.area2_e6sq == 200 and out.perim_floor_e6 == 40


def test_degenerate_ways_filtered(spark):
    rows = [(1, 0, 0, 0), (1, 1, 5, 5),            # 2 distinct points
            (2, 0, 3, 3), (2, 1, 3, 3), (2, 2, 3, 3),  # 1 distinct point
            (3, 0, 0, 0), (3, 1, 10, 0), (3, 2, 0, 10)]  # valid triangle
    out = assembly.assemble_rings(_parts(spark, rows)).toPandas()
    assert set(out.way_id) == {3}
    assert out.iloc[0].area2_e6sq == 100


def test_size_properties_convex_square_concavity_one(spark):
    rows = [(1, 0, 0, 0), (1, 1, 10, 0), (1, 2, 10, 10), (1, 3, 0, 10)]
    out = assembly.size_properties(_parts(spark, rows)).toPandas().iloc[0]
    assert out.hull_area2_e6sq == 200 and out.concavity == 1.0


def test_size_properties_concave_L_shape(spark):
    # L-shape: 10x10 square minus the 5x5 upper-right quadrant
    rows = [(1, 0, 0, 0), (1, 1, 10, 0), (1, 2, 10, 5), (1, 3, 5, 5),
            (1, 4, 5, 10), (1, 5, 0, 10)]
    out = assembly.size_properties(_parts(spark, rows)).toPandas().iloc[0]
    assert out.area2_e6sq == 150        # area 75
    assert out.hull_area2_e6sq == 175   # hull = square minus corner tri 12.5
    assert out.concavity == 150 / 175


def test_size_properties_collinear_chain_on_hull_edge(spark):
    # collinear boundary point (5,0) must not break the hull edge cycle
    rows = [(1, 0, 0, 0), (1, 1, 5, 0), (1, 2, 10, 0), (1, 3, 10, 10),
            (1, 4, 0, 10)]
    out = assembly.size_properties(_parts(spark, rows)).toPandas().iloc[0]
    assert out.hull_area2_e6sq == 200 and out.concavity == 1.0


def test_size_properties_hull_matches_numpy(spark):
    """Driver-fixture ways: relational hull area equals monotone-chain hull
    area, and the fixture is non-degenerate (concavity spread below 1)."""
    import numpy as np
    import __spark_entry__ as E
    from conftest import SF_SMOKE
    from geoclimate_spark import geometry
    res = assembly.size_properties(
        E._way_parts_df(spark, SF_SMOKE)).toPandas().set_index("way_id")
    parts = E._way_parts_df(spark, SF_SMOKE).toPandas()
    for wid, g in parts.groupby("way_id"):
        pts = np.unique(g[["x", "y"]].to_numpy(float), axis=0)
        if len(pts) < 3 or wid not in res.index:
            continue
        hull = geometry.convex_hull(pts)
        ha = geometry.poly_area(hull) if len(hull) >= 3 else 0.0
        assert abs(res.loc[wid, "hull_area2_e6sq"] / 2.0 - ha) <= 1e-6 * max(ha, 1)
    assert res["concavity"].min() < 0.9 < res["concavity"].max()
