"""Config workflow runner + mode-C pair-area join tests."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F

from geoclimate_spark.operators import raster
from geoclimate_spark.plans import workflow


def test_intersect_pair_areas_vs_oracle(spark, duck):
    rects = spark.createDataFrame(
        [(i, -30_000_000 + i * 7_000_000, -20_000_000 + i * 3_000_000,
          -10_000_000 + i * 7_000_000, 5_000_000 + i * 3_000_000)
         for i in range(8)],
        "rect_id long, lon0 long, lat0 long, lon1 long, lat1 long")
    rects_sql = ("SELECT CAST(rect_id AS BIGINT) rect_id, CAST(lon0 AS BIGINT) lon0,"
                 " CAST(lat0 AS BIGINT) lat0, CAST(lon1 AS BIGINT) lon1,"
                 " CAST(lat1 AS BIGINT) lat1 FROM (VALUES " +
                 ", ".join(f"({i}, {-30_000_000 + i*7_000_000}, {-20_000_000 + i*3_000_000},"
                           f" {-10_000_000 + i*7_000_000}, {5_000_000 + i*3_000_000})"
                           for i in range(8)) +
                 ") AS t(rect_id, lon0, lat0, lon1, lat1)")
    got = (raster.intersect_pair_areas(raster.zone_bounds_df(spark), rects)
           .toPandas().sort_values(["zone_id", "rect_id"]).reset_index(drop=True))
    exp = (duck.sql(raster.intersect_pair_areas_sql(
        raster.zone_bounds_values_sql(), rects_sql))
        .df().sort_values(["zone_id", "rect_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)], check_dtype=False)
    assert (got.area_e6sq > 0).all()
    # every rect's pair areas sum to its own area (zones tile the globe)
    sums = got.groupby("rect_id").area_e6sq.sum()
    assert (sums == 20_000_000 * 25_000_000).all()


def test_workflow_config_run_and_resume(spark, tmp_path):
    cfg = {
        "input": {"sf_dir": "/root/testdata/sf0.001"},
        "run_dir": str(tmp_path / "run"),
        "export": {"dir": str(tmp_path / "out"), "format": "parquet",
                   "tables": ["zone_tile_agg"]},
    }
    r1 = workflow.run_config(spark, cfg)
    assert [h for _, h in r1["stages"]] == ["computed"] * 3
    assert "zone_tile_agg" in r1["exported"]
    out = spark.read.parquet(r1["exported"]["zone_tile_agg"])
    assert out.count() > 0
    # rerun: everything resumes from snapshots
    r2 = workflow.run_config(spark, cfg)
    assert [h for _, h in r2["stages"]] == ["resumed"] * 3
    # config file round-trip through main()
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    assert workflow.main([str(p)]) == 0
