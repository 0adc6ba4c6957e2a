"""Geometry properties UDF + file sinks tests."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoclimate_spark.functions import geom_props
from geoclimate_spark.sources import sinks


def test_geometry_props_vs_oracle(spark, duck):
    df = geom_props.with_geometry_props(
        geom_props.zone_vertices_df(spark)).drop("vertices")
    got = df.toPandas().sort_values("zone_id").reset_index(drop=True)
    exp = (duck.sql(geom_props.geometry_props_oracle_sql()).df()
           .sort_values("zone_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)], check_dtype=False)
    # hand value: sector 30 deg wide, tropic band 46.88 tall -> area
    z36 = got[got.zone_id == 36].iloc[0]  # tropic band, first sector
    assert abs(z36.area_deg2 - 30 * 46.88) < 1e-6
    assert z36.n_points == 4


def test_save_tables_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("part"))
    paths = sinks.save_tables({"t1": df}, tmp_path, fmt="parquet",
                              partition_by=["part"])
    back = spark.read.parquet(paths["t1"])
    assert back.count() == 100
    assert set(back.columns) == {"id", "part"}
    csvp = sinks.save_tables({"t2": df}, tmp_path, fmt="csv")
    assert spark.read.option("header", "true").csv(csvp["t2"]).count() == 100


def test_csv_budget_enforced(spark, tmp_path):
    df = spark.range(50)
    with pytest.raises(ValueError, match="budget"):
        sinks.save_tables({"big": df}, tmp_path, fmt="csv", csv_row_budget=10)
