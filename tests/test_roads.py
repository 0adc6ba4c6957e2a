"""Road/line-layer zonal operators vs DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geoclimate_spark.operators import raster, roads


def test_road_zone_stats_vs_oracle(spark, duck):
    got = (roads.road_zone_stats(roads.roads_df(spark),
                                 raster.zone_bounds_df(spark))
           .toPandas().sort_values("zone_id").reset_index(drop=True))
    exp = (duck.sql(roads.road_zone_stats_sql(
        roads.roads_values_sql(), raster.zone_bounds_values_sql()))
        .df().sort_values("zone_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)], check_dtype=False)
    # direction bins partition the total (same integer sums)
    dirs = got[[f"dir{i}" for i in range(8)]].sum(axis=1)
    assert np.allclose(dirs, got.total_len, atol=1e-6)
    assert (got.lin_density > 0).all()


def test_clip_length_hand_case(spark):
    # segment crossing a zone diagonally: (0,0)->(10,5) through rect x:[2,6]
    z = spark.createDataFrame([(1, 2, -10, 6, 10)],
                              "zone_id long, zlon0 long, zlat0 long, zlon1 long, zlat1 long")
    r = spark.createDataFrame([(0, 0, 0, 10, 5)],
                              "road_id long, x0 long, y0 long, x1 long, y1 long")
    out = roads.road_zone_stats(r, z).toPandas().iloc[0]
    # t_enter = 0.2, t_exit = 0.6 -> 0.4 * sqrt(125)
    assert abs(out.total_len - 0.4 * np.sqrt(125)) < 1e-3


def test_no_axis_parallel_segments():
    rows = roads.synth_roads_rows()
    for _, x0, y0, x1, y1, *_attrs in rows:
        assert x1 != x0 and y1 != y0
