"""Event windows, sessionization, connected components vs DuckDB oracles."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geoclimate_spark.operators import components, windows

SF = "/root/testdata/sf0.001"


def _cmp(spark_df, duck, sql, sort_cols):
    got = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    exp = duck.sql(sql).df().sort_values(sort_cols).reset_index(drop=True)
    got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    return got


def test_tumbling_window(spark, duck):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = _cmp(windows.tumbling_window_agg(ev, 3600), duck,
               windows.tumbling_window_agg_sql(3600),
               ["window_start", "event_type"])
    assert (got.window_start % 3600 == 0).all()
    assert got.n_events.sum() == ev.count()


def test_sessionize(spark, duck):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = _cmp(windows.sessionize(ev, gap_sec=600), duck,
               windows.sessionize_sql(gap_sec=600),
               ["user_id", "session_id"])
    assert (got.duration_us >= 0).all()
    assert got.n_events.sum() == ev.count()
    # session ids are 1..k per user
    for _, g in got.groupby("user_id"):
        assert sorted(g.session_id) == list(range(1, len(g) + 1))


_PTS_SQL = """
SELECT doc_id AS page_id,
       CAST(2350000 + (doc_id * 48271 + 11) % 2147483647 % 200001 - 100000 AS BIGINT) AS lon_e6,
       CAST(48850000 + (doc_id * 16807 + 7) % 2147483647 % 200001 - 100000 AS BIGINT) AS lat_e6
FROM documents WHERE doc_id % 2 = 0"""


def _pts(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .where(F.col("doc_id") % 2 == 0)
            .select(F.col("doc_id").alias("page_id"),
                    (F.lit(2350000) + (F.col("doc_id") * 48271 + 11)
                     % 2147483647 % 200001 - 100000).alias("lon_e6"),
                    (F.lit(48850000) + (F.col("doc_id") * 16807 + 7)
                     % 2147483647 % 200001 - 100000).alias("lat_e6")))


def test_connected_components(spark, duck):
    R = 20_000  # 0.02 degrees over a +-0.1 degree cluster -> several blocks
    pts = _pts(spark)
    edges = components.proximity_edges(pts, R)
    got = _cmp(components.connected_components(pts.select(F.col("page_id")), edges,
                                               key="page_id"),
               duck, components.connected_components_sql(_PTS_SQL, R),
               ["page_id"])
    assert len(got) == pts.count()
    # component id is the min member id
    mins = got.groupby("component").page_id.min()
    assert (mins.index == mins.values).all()
    # non-trivial structure: at least one multi-member and one singleton
    assert (got.component_size > 1).any()


def test_proximity_edges_symmetric_bound(spark):
    pts = _pts(spark)
    e = components.proximity_edges(pts, 20_000).toPandas()
    assert (e.id_a < e.id_b).all()
    assert not e.duplicated(["id_a", "id_b"]).any()
