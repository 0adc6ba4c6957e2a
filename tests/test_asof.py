"""As-of join edge semantics (hand cases; driver parity in test_entry)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from geoclimate_spark.operators import asof

TS = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)

L_SCHEMA = T.StructType([
    T.StructField("eid", T.LongType()),
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])
R_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def _run(spark, lrows, rrows, **kw):
    out = asof.as_of_join(
        spark.createDataFrame(lrows, L_SCHEMA),
        spark.createDataFrame(rrows, R_SCHEMA), key="k", **kw)
    return {r.eid: (r.asof_value, r.asof_lag_us) for r in out.collect()}


def test_latest_prior_wins_and_no_match_is_null(spark):
    got = _run(spark,
               [(1, 1, TS(10)), (2, 1, TS(30)), (3, 2, TS(5))],
               [(1, TS(8), 1.5), (1, TS(20), 2.5)])
    assert got[1] == (1.5, 2_000_000)
    assert got[2] == (2.5, 10_000_000)
    assert got[3] == (None, None)   # key 2 has no feed at all


def test_simultaneous_right_row_is_visible(spark):
    # t_right <= t_left: a feed row AT the event's timestamp matches (lag 0)
    got = _run(spark, [(1, 1, TS(10))], [(1, TS(10), 7.0)])
    assert got[1] == (7.0, 0)


def test_tolerance_nulls_stale_matches(spark):
    got = _run(spark,
               [(1, 1, TS(10)), (2, 1, TS(50))],
               [(1, TS(8), 1.5)],
               tolerance_us=10_000_000)
    assert got[1] == (1.5, 2_000_000)
    assert got[2] == (None, None)   # 42 s stale > 10 s tolerance


def test_null_right_value_rides_with_its_timestamp(spark):
    # matched feed row with NULL value → asof_value NULL but lag = that
    # row's lag (NOT an older non-NULL value) — ADVICE r2 regression
    got = _run(spark,
               [(1, 1, TS(30))],
               [(1, TS(10), 1.5), (1, TS(20), None)])
    assert got[1] == (None, 10_000_000)


def test_interval_join_empty_and_inverted_intervals_yield_no_rows(spark):
    import datetime as dt
    from pyspark.sql import types as T
    from geoclimate_spark.operators import asof

    left = spark.createDataFrame([(1, 1, TS(10))], L_SCHEMA)
    iv_schema = T.StructType([
        T.StructField("interval_id", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ])
    t0 = int(dt.datetime(2024, 1, 1, 0, 0, 10).timestamp() * 1_000_000)
    ivs = spark.createDataFrame(
        [(1, 1, t0, t0),            # empty: end == start
         (2, 1, t0, t0 - 5),        # inverted
         (3, 1, t0, t0 + 1)],       # valid, contains t0
        iv_schema)
    out = asof.interval_join(left, ivs, key="k").collect()
    assert [(r.interval_id, r.offset_us) for r in out] == [(3, 0)]
