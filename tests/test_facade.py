"""Facade / roof / frontal family — hand-computed scenarios.

Driver-oracle parity is covered by tests/test_entry.py parametrization;
these tests pin the SEMANTICS with tiny hand-checked inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geoclimate_spark.operators import facade

B = 10  # buffer half-side → squares 20 µ° wide


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "page_id long, zone_id long, lon_e6 long, lat_e6 long, chars long")


def _zones(spark):
    return spark.createDataFrame(
        [(1, 0, 0, 1000, 1000), (2, 1000, 0, 2000, 1000)],
        "zone_id long, zlon0 long, zlat0 long, zlon1 long, zlat1 long")


def test_isolated_square_all_free(spark):
    """One isolated square: 4 free walls of len 2B, height fully in layer 0."""
    pages = _pages(spark, [(1, 1, 100, 100, 150)])
    out = facade.facade_area_distribution(pages, _zones(spark), B).toPandas()
    row = out[out.zone_id == 1].iloc[0]
    # each direction class has 2 walls * len 20 * height 150 = 6000
    assert row.f_we_h0 == 2 * 2 * B * 150
    assert row.f_ns_h0 == 2 * 2 * B * 150
    assert row.f_we_h1 == 0 and row.f_we_h2 == 0
    empty = out[out.zone_id == 2].iloc[0]
    assert empty.f_we_h0 == 0 and empty.f_ns_h2 == 0


def test_layer_clipping_spans_bounds(spark):
    """chars=450 spans all three layers: 200 + 200 + 50."""
    pages = _pages(spark, [(1, 1, 100, 100, 450)])
    out = facade.facade_area_distribution(pages, _zones(spark), B).toPandas()
    row = out[out.zone_id == 1].iloc[0]
    assert row.f_we_h0 == 40 * 200
    assert row.f_we_h1 == 40 * 200
    assert row.f_we_h2 == 40 * 50


def test_party_wall_union_no_double_subtract(spark):
    """Two squares, b fully covering a's east wall AND a third overlapping
    the same stretch: the union subtraction must not double-count."""
    # a at x=100, b at x=115 (a.x1=110 inside b=[105,125]) covering a's east
    # wall entirely (y overlap total); c at x=117 also covers it
    pages = _pages(spark, [(1, 1, 100, 100, 100),
                           (2, 1, 115, 100, 300),
                           (3, 1, 117, 100, 300)])
    sq = facade.square_footprints(pages, B)
    ov = facade._wall_overlaps(facade.overlap_pairs(sq, B))
    cov = facade._merged_covered_len(ov).toPandas()
    east_a = cov[(cov.id_a == 1) & (cov.dir == "e")]
    assert east_a.covered_len.iloc[0] == 2 * B  # whole wall once, not twice


def test_theta_pairs_ordered(spark):
    pages = _pages(spark, [(1, 1, 100, 100, 300), (2, 1, 110, 100, 100)])
    out = facade.theta_contact_pairs(pages, B).toPandas()
    # only (taller, shorter) direction qualifies
    assert len(out) == 1
    assert out.iloc[0].id_a == 1 and out.iloc[0].h_gap == 200
    # shared rect: x [100-10..100+10]∩[110-10..110+10] = [100,110] → 10 wide,
    # y fully shared → 20 tall
    assert out.iloc[0].shared_area_e6sq == 10 * 20


def test_roof_exact_no_double_count(spark):
    """Two half-overlapping squares: total roof area == union area, and the
    overlap region goes to the taller page's layer."""
    pages = _pages(spark, [(1, 1, 100, 100, 150), (2, 1, 110, 100, 250)])
    out = facade.roof_layer_distribution_exact(pages, B).toPandas()
    # union area = 2*400 - overlap(10*20=200) = 600
    assert out.roof_area_e6sq.sum() == 600
    # page2 (chars=250 → layer 1) wins the overlap: its full square 400
    l1 = out[out.layer == 1].roof_area_e6sq.iloc[0]
    l0 = out[out.layer == 0].roof_area_e6sq.iloc[0]
    assert l1 == 400 and l0 == 200
    # exact built volume: winner height x overlap-free area
    assert out[out.layer == 1].volume_e6sq_chars.iloc[0] == 400 * 250
    assert out[out.layer == 0].volume_e6sq_chars.iloc[0] == 200 * 150


def test_layer_clipping_partitions_band(spark):
    """Σ over layers of the clipped contribution == z_max - z_min for any
    band — the reference formula is a partition of the height interval."""
    rows = [(i, zmin, zmax) for i, (zmin, zmax) in enumerate(
        [(0, 50), (0, 200), (0, 250), (100, 300), (150, 450), (200, 400),
         (350, 800), (400, 401), (0, 1000), (399, 400), (200, 200)])]
    df = spark.createDataFrame(rows, "i long, z_min long, z_max long")
    out = df.select("z_min", "z_max",
                    *facade._layer_cols(F.col("z_min"), F.col("z_max"))).toPandas()
    for _, r in out.iterrows():
        assert r.h0 + r.h1 + r.h2 == r.z_max - r.z_min, dict(r)
