"""Text-analysis metrics vs DuckDB oracle (bit-exact)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geoclimate_spark.functions import text as T

SF = "/root/testdata/sf0.001"


def test_text_metrics_parity(spark, duck):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cols = T.text_metrics_cols(F.col("text"))
    got = (docs.select(F.col("doc_id").alias("id"),
                       *[c.alias(n) for n, c in cols.items()])
           .toPandas().sort_values("id").reset_index(drop=True))
    frags = T.text_metrics_sql("text")
    sel = ",\n  ".join(f"{sql} AS {name}" for name, sql in frags.items())
    exp = duck.sql(f"SELECT doc_id AS id,\n  {sel}\nFROM documents"
                   ).df().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)], check_dtype=False)
    assert got.quality.between(0, 1).all()
    assert got.lang_guess.isin([l for l, _ in T.LANG_STOPWORDS]).all()


def test_fingerprint_is_stable_and_normalizing(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
        ["id", "text"])
    fp = T.text_metrics_cols(F.col("text"))["fingerprint"]
    rows = {r.id: r.fp for r in df.select("id", fp.alias("fp")).collect()}
    assert rows[1] == rows[2] != rows[3]
