"""joinTables N-way assembler semantics."""

from __future__ import annotations

from geoclimate_spark.plans import joiner


def test_join_tables_anchor_keeps_rows_and_drops_ids(spark):
    a = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "zone_id long, x long")
    b = spark.createDataFrame([(1, "u"), (2, "v")], "zid long, y string")
    c = spark.createDataFrame([(2, 7.5)], "zone_id long, z double")
    out = joiner.join_tables([("ta", a, "zone_id"), ("tb", b, "zid"),
                              ("tc", c, "zone_id")]).toPandas()
    assert sorted(out.columns) == ["x", "y", "z", "zone_id"]
    assert len(out) == 3  # anchor keeps all rows
    import pandas as pd
    row3 = out[out.zone_id == 3].iloc[0]
    assert row3.x == 30 and pd.isna(row3.y)


def test_join_tables_prefixing(spark):
    a = spark.createDataFrame([(1, 10)], "zone_id long, x long")
    b = spark.createDataFrame([(1, 5)], "zone_id long, x long")
    out = joiner.join_tables([("ta", a, "zone_id"), ("tb", b, "zone_id")],
                             prefix_with_name=True).toPandas()
    assert sorted(out.columns) == ["ta_x", "tb_x", "zone_id"]
    assert out.iloc[0].ta_x == 10 and out.iloc[0].tb_x == 5
