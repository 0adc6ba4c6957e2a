"""Accent folding: known foldings, dedup-key collision property, parity."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from geoclimate_spark.operators import textfold as TF


def test_known_foldings(spark):
    df = spark.createDataFrame(
        [(1, "Café straße NAÏVE œuvre ærø"), (2, "plain ascii")],
        "doc_id long, t string")
    rows = {r.doc_id: r.f for r in
            df.select("doc_id", TF.fold_col(F.col("t")).alias("f")).collect()}
    assert rows[1] == "cafe strasse naive oeuvre aero"
    assert rows[2] == "plain ascii"


def test_dedup_key_collision(spark):
    # the property the fold exists for: accented and plain variants of the
    # same phrase produce IDENTICAL folded keys
    df = spark.createDataFrame(
        [(1, "Jalapeño façade"), (2, "jalapeno facade")],
        "doc_id long, t string")
    keys = [r.f for r in
            df.select(TF.fold_col(F.col("t")).alias("f")).collect()]
    assert keys[0] == keys[1]


def test_profile_counts(spark):
    df = spark.createDataFrame([(0, "x", "en"), (1, "y", "en")],
                               "doc_id long, text string, lang string")
    rows = {r.doc_id: r for r in
            TF.fold_profile(TF.with_synthetic_accents(df)).collect()}
    # doc 1 (odd) gets no injection: nothing changes
    assert rows[1].n_changed == 0
    assert rows[1].n_chars_in == rows[1].n_chars_out == 1
    # doc 0: one snippet, ligatures grow the text (ß→ss, œ→oe, æ→ae)
    r0 = rows[0]
    assert r0.n_changed > 0
    n_lig = TF._SNIPPET.count("ß") + TF._SNIPPET.count("œ") \
        + TF._SNIPPET.count("æ")
    assert r0.n_chars_out == r0.n_chars_in + n_lig


def test_parity(spark):
    docs = [(i, f"t{i}", "en") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = TF.fold_profile(TF.with_synthetic_accents(df)).toPandas()
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", docs)
    want = con.execute(TF.fold_profile_sql("docs")).fetchdf()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True).astype(
        g.dtypes.to_dict())
    assert g.equals(w)
