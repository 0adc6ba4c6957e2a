"""Hand-case semantics for the round-3 operators (oracle parity lives in
test_entry): gridDistances, inverse cover, gable roof, neighbor smoothing,
relation assembly with holes, road traffic defaults."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from geoclimate_spark.operators import griddist, overlay, roads
from geoclimate_spark.operators import tile as tile_op
from geoclimate_spark.sources import assembly


def test_grid_distances_square_hand_case(spark):
    # axis-aligned square [0, 4G] x [0, 4G]: 16 covering cells have centers
    # inside; distance = min distance to the four sides
    G = griddist.GRID_CELL
    vtx = spark.createDataFrame(
        [(1, 0, 0, 0), (1, 1, 4 * G, 0), (1, 2, 4 * G, 4 * G), (1, 3, 0, 4 * G)],
        "zone_id long, seq long, x long, y long")
    out = {(r.gx, r.gy): r.distance
           for r in griddist.grid_distances(vtx).collect()}
    assert len(out) == 16
    # corner cell (0,0): center (G/2, G/2) -> distance G/2 to both sides
    assert out[(0, 0)] == G / 2
    # interior cell (1, 1): center 1.5G from left/bottom
    assert out[(1, 1)] == 1.5 * G
    # centers outside (gx=4 row from bbox edge) must not appear
    assert (4, 0) not in out


def test_grid_distances_matches_triangle_geometry(spark):
    # right triangle (0,0)-(8G,0)-(0,8G): cell centers inside get distance
    # to the nearest of the three edges incl. the hypotenuse
    G = griddist.GRID_CELL
    vtx = spark.createDataFrame(
        [(7, 0, 0, 0), (7, 1, 8 * G, 0), (7, 2, 0, 8 * G)],
        "zone_id long, seq long, x long, y long")
    rows = griddist.grid_distances(vtx).collect()
    assert rows
    for r in rows:
        px, py = r.gx * G + G // 2, r.gy * G + G // 2
        d_hyp = abs(px + py - 8 * G) / math.sqrt(2)
        want = min(px, py, d_hyp)
        assert abs(r.distance - want) < 1e-6, (r.gx, r.gy)


def test_inverse_cover_complements_union(spark):
    zones = spark.createDataFrame(
        [(1, 0, 0, 100, 100), (2, 500, 500, 600, 600)],
        "zone_id long, zlon0 long, zlat0 long, zlon1 long, zlat1 long")
    rects = spark.createDataFrame(
        [("water", 0, 0, 50, 100), ("veg", 25, 0, 75, 100)],
        "layer string, lon0 long, lat0 long, lon1 long, lat1 long")
    names = ["water", "veg"]
    combos = overlay.overlay_rect_layers(zones, rects, names)
    out = {r.zone_id: r for r in
           overlay.inverse_cover(combos, zones, names).collect()}
    # zone 1: union covers x<75 -> complement 25*100
    assert out[1].inverse_area_e6sq == 2500
    assert abs(out[1].inverse_frac - 0.25) < 1e-12
    # zone 2: untouched -> full area
    assert out[2].inverse_area_e6sq == 10000
    assert out[2].inverse_frac == 1.0


def test_gable_roof_isolated_building(spark):
    # one building, h=300, z_min=150, dh=150, bands (0,200,400):
    # band0 [0,200): nv = nvra*(200-150)/150, v = vra*((50/150)^2)... checks
    # conservation: nv sums to nvra, v sums to vra
    from geoclimate_spark.operators import facade
    pages = spark.createDataFrame(
        [(1, 7, 1000000, 1000000, 300)],
        "page_id long, zone_id long, lon_e6 long, lat_e6 long, chars long")
    zones = spark.createDataFrame([(7,)], "zone_id long")
    r = 25_000
    out = facade.roof_area_distribution_gable(pages, zones, r).collect()[0]
    area = (2 * r) ** 2
    dh = 150
    nvra = math.sqrt(area ** 2 + 4 * area * dh ** 2)
    vra = math.sqrt(area) * dh
    assert abs((out.nv_h0 + out.nv_h1 + out.nv_h2) - nvra) < 2e-3
    assert abs((out.v_h0 + out.v_h1 + out.v_h2) - vra) < 2e-3
    # band split: z_max=300 <= 400 -> nv_h1 = nvra*(300-200)/150
    assert abs(out.nv_h1 - nvra * 100 / 150) < 2e-3
    assert out.nv_h2 == 0.0 and out.v_h2 == 0.0


def test_gable_party_wall_removal(spark):
    # tall neighbor (wall 500 >= small roof 100) removes sqrt(A)*dh_b/2
    # from the small building's vertical roof area
    from geoclimate_spark.operators import facade
    r = 25_000
    pages = spark.createDataFrame(
        [(1, 7, 1_000_000, 1_000_000, 1000),   # z_min=500
         (2, 7, 1_020_000, 1_000_000, 100)],   # z_max=100 <= 500
        "page_id long, zone_id long, lon_e6 long, lat_e6 long, chars long")
    zones = spark.createDataFrame([(7,)], "zone_id long")
    out = facade.roof_area_distribution_gable(pages, zones, r).collect()[0]
    area = (2 * r) ** 2
    # building 2: dh=50, vra = 50000*50 - 50000*50/2 (one neighbor removal)
    v2 = math.sqrt(area) * 50 / 2
    # building 1: dh=500, no removal (2's wall 50 < 1's roof 1000)
    # band sums must equal vra1 + v2
    vra1 = math.sqrt(area) * 500
    assert abs((out.v_h0 + out.v_h1 + out.v_h2) - (vra1 + v2)) < 5e-3


def test_neighbor_smoothing_hand_case(spark):
    # three adjacent tiles in a row at res 7: the middle sees both others
    res = 7
    mk = lambda x, y: (res << 58) | (x << 29) | y
    tiles = spark.createDataFrame(
        [(mk(10, 10), "en", 5), (mk(11, 10), "fr", 10), (mk(12, 10), "en", 7)],
        "tile_id long, mode_lang string, mode_weight long")
    out = {r.tile_id: r for r in tile_op.neighbor_smoothing(
        tiles, res, warm=("en",)).collect()}
    mid = out[mk(11, 10)]
    assert mid.n_nbrs == 2
    assert mid.n_warm9 == 2          # the two en tiles among self+8
    assert mid.smooth_mode_lang == "en"   # 5+7 en > 10 fr
    assert mid.smooth_weight == 12
    left = out[mk(10, 10)]
    assert left.n_nbrs == 1
    assert left.n_warm9 == 1
    # left neighborhood: en 5 vs fr 10 -> fr wins
    assert left.smooth_mode_lang == "fr"


def test_relation_assembly_holes(spark):
    # outer 10x10 square with a 2x2 hole: net 2*area = 2*(100-4)
    parts = spark.createDataFrame(
        [(1, 0, "outer", 0, 0, 0), (1, 0, "outer", 1, 10, 0),
         (1, 0, "outer", 2, 10, 10), (1, 0, "outer", 3, 0, 10),
         (1, 1, "inner", 0, 4, 4), (1, 1, "inner", 1, 6, 4),
         (1, 1, "inner", 2, 6, 6), (1, 1, "inner", 3, 4, 6),
         # relation 2: hole only (no outer) -> dropped
         (2, 0, "inner", 0, 0, 0), (2, 0, "inner", 1, 3, 0),
         (2, 0, "inner", 2, 3, 3)],
        "relation_id long, ring_id long, role string, seq long, x long, y long")
    out = assembly.assemble_relations(parts).collect()
    assert len(out) == 1
    r = out[0]
    assert r.relation_id == 1
    assert r.n_rings == 2 and r.n_holes == 1
    assert r.area2_e6sq == 2 * (100 - 4)
    assert r.hole_area2_e6sq == 2 * 4
    # perimeter counts shell AND hole boundary (40 + 8)
    assert r.perim_floor_e6 == 48


def test_road_traffic_defaults_and_exclusions(spark):
    rdf = roads.road_traffic(roads.roads_df(spark))
    rows = {r.road_id: r for r in rdf.collect()}
    src = {k: (t, sf, ms, di) for k, _, _, _, _, t, sf, ms, di, _
           in roads.synth_roads_rows()}
    for k, (t, sf, ms, di) in src.items():
        if t in roads.TRAFFIC_EXCLUDED:
            assert k not in rows
            continue
        r = rows[k]
        cls = roads.TRAFFIC_CLASS[t]
        assert r.road_type == cls
        want_ms = roads.MAXSPEED_DEFAULT[cls] if ms == -1 else ms
        assert r.maxspeed == want_ms
        assert r.pavement == roads.PAVEMENT.get(sf, roads.PAVEMENT_DEFAULT)
        full = roads.TRAFFIC_FLOW[cls][0]
        assert r.day_lv_hour == (full if di == 3 else full // 2)
