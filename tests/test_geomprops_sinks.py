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


def test_catalog_sink_roundtrip_and_bucketing(spark, tmp_path):
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 13).alias("v"))
    dim = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp"))
    qual = sinks.save_to_catalog(
        {"facts": df, "dims": dim}, "gc_test_db", location=str(tmp_path),
        bucket_by={"facts": (4, ["k"]), "dims": (4, ["k"])})
    assert qual == {"facts": "gc_test_db.facts", "dims": "gc_test_db.dims"}
    back = sinks.load_from_catalog(spark, "gc_test_db", "facts")
    assert back.count() == 200
    assert {r.k for r in back.collect()} == set(range(200))

    # bucketed co-located equi-join: no shuffle (Exchange) on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = sinks.load_from_catalog(spark, "gc_test_db", "facts").join(
            sinks.load_from_catalog(spark, "gc_test_db", "dims"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 200
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))

    # snapshot overwrite: same name, new contents, no duplication
    df2 = spark.range(50).select(F.col("id").alias("k"),
                                 F.lit(0).cast("long").alias("v"))
    sinks.save_to_catalog({"facts": df2}, "gc_test_db", location=str(tmp_path))
    assert sinks.load_from_catalog(spark, "gc_test_db", "facts").count() == 50
    spark.sql("DROP DATABASE gc_test_db CASCADE")
