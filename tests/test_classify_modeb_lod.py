"""Min-distance classifier, mode-B tile assignment, LOD rollup tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geoclimate_spark.operators import classify, raster
from geoclimate_spark.operators import tile as tile_op


def _cmp(spark_df, duck, sql, sort_cols):
    got = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    exp = duck.sql(sql).df().sort_values(sort_cols).reset_index(drop=True)
    got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    return got


def test_largest_overlap_tile(spark, duck):
    got = _cmp(tile_op.largest_overlap_tile(spark, raster.zone_bounds_df(spark), 7),
               duck,
               tile_op.largest_overlap_tile_sql(raster.zone_bounds_values_sql(), 7),
               ["zone_id"])
    assert len(got) == 84
    assert (got.overlap_e6sq > 0).all()


def test_classify_min_distance(spark, duck):
    rows_sql = """
SELECT doc_id AS id,
       CAST(doc_id % 13 AS DOUBLE) AS f1,
       CAST(doc_id % 7 AS DOUBLE) AS f2
FROM documents"""
    rows = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select(F.col("doc_id").alias("id"),
                    (F.col("doc_id") % 13).cast("double").alias("f1"),
                    (F.col("doc_id") % 7).cast("double").alias("f2")))
    cents = {"a": [2.0, 2.0], "b": [8.0, 2.0], "c": [5.0, 6.0]}
    scales = [3.0, 2.0]
    got = _cmp(classify.classify_min_distance(rows, ["id"], ["f1", "f2"],
                                              cents, scales),
               duck,
               classify.classify_min_distance_sql(rows_sql, ["id"],
                                                  ["f1", "f2"], cents, scales),
               ["id"])
    assert set(got.cls) <= {"a", "b", "c"}
    assert (got.dist1 <= got.dist2).all()
    assert got.uniqueness.between(0, 1).all()
    # hand-check one row: doc 0 -> f=(0,0): d_a=(2/3)^2+1, d_b=(8/3)^2+1, d_c=(5/3)^2+9
    r0 = got[got.id == 0].iloc[0]
    assert r0.cls == "a"


def test_classify_null_sentinel(spark):
    rows = spark.createDataFrame([(1, 1.0, None), (2, 1.0, 1.0)],
                                 "id long, f1 double, f2 double")
    out = classify.classify_min_distance(
        rows, ["id"], ["f1", "f2"], {"a": [0.0, 0.0], "b": [9.0, 9.0]},
        [1.0, 1.0]).toPandas().set_index("id")
    assert out.loc[1, "cls"] == "unclassified"
    assert out.loc[1, "dist1"] == classify.SENTINEL
    assert out.loc[2, "cls"] == "a"


def test_lod_rollup_consistency(spark):
    """Parent rollups preserve totals (exact containment of the grid)."""
    from geoclimate_spark import grid
    pts = (spark.range(1000)
           .select((F.col("id") * 7919 % 360_000_000 - 180_000_000).alias("lon_e6"),
                   (F.col("id") * 104729 % 170_000_000 - 85_000_000).alias("lat_e6")))
    base = (pts.withColumn("cell", grid.cell_col(F.col("lon_e6"), F.col("lat_e6"), 7))
            .groupBy("cell").agg(F.count("*").alias("n")))
    lods = tile_op.lod_rollup(base, "cell", 7, 4, [F.sum("n").alias("n")])
    for r, df in lods.items():
        p = df.toPandas()
        assert p.n.sum() == 1000, r
        import numpy as np
        rs = np.unique(p.cell.to_numpy(np.int64) >> 58)
        assert list(rs) == [r]
