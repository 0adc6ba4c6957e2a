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
