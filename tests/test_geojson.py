"""GeoJSON FeatureCollection front door: JVM-only parse, ring re-opening,
hole/multi-part indexing, snap recovery, CRS origin path."""
from __future__ import annotations

from pyspark.sql import functions as F

from geoclimate_spark.sources import geojson as G
from geoclimate_spark.sources import layers, wkb


def test_convex_features_recover_planted_layer(spark):
    vtx = G.feature_vertices(G.geojson_convex_features_df(spark),
                             props=("layer",))
    got = {(r.feat_id, r.seq): (r.layer, r.x, r.y) for r in vtx.collect()}
    want = {(f, s): (layer, x, y)
            for f, layer, s, x, y in layers.synth_poly_feature_rows()}
    assert got == want
    # closing vertex dropped: row counts equal the OPEN ring counts
    assert len(got) == len(want)


def test_multipolygon_holes_recover_parts_and_rings(spark):
    vtx = G.feature_vertices(G.geojson_multipoly_features_df(spark))
    got = {(r.feat_id, r.part, r.ring, r.seq): (r.x, r.y)
           for r in vtx.collect()}
    want = {(f, p, rg, sq): (x, y)
            for f, p, rg, sq, x, y in wkb.synth_multipoly_rows()}
    assert got == want


def test_origin_transform_matches_wkb_door(spark):
    """The GeoJSON door with origin= must agree with the WKB door's
    equirect transform: project the multipoly fixture's lon/lat JSON and
    compare against the planted metric ints."""
    lon0, lat0 = -1.5534, 47.2173
    cx, cy = wkb.equirect_scales(lat0)
    import json as J
    rows = []
    for fid, fj in G.geojson_multipoly_features_df(spark).collect():
        d = J.loads(fj)
        polys = [[[[lon0 + x / cx, lat0 + y / cy] for x, y in ring]
                  for ring in poly] for poly in d["geometry"]["coordinates"]]
        rows.append((fid, G._feature_json(fid, "MultiPolygon", polys, {})))
    feats = spark.createDataFrame(rows, "feat_id long, feature_json string")
    vtx = G.feature_vertices(feats, origin=(lon0, lat0))
    got = {(r.feat_id, r.part, r.ring, r.seq): (r.x, r.y)
           for r in vtx.collect()}
    want = {(f, p, rg, sq): (x, y)
            for f, p, rg, sq, x, y in wkb.synth_multipoly_rows()}
    assert got == want


def test_parse_is_pure_jvm(spark):
    """The whole decode must be codegen — no Python eval node, no shuffle."""
    vtx = G.feature_vertices(G.geojson_convex_features_df(spark),
                             props=("layer",))
    plan = vtx._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Exchange" not in plan
