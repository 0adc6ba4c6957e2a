"""Round-5 operators: posting-size planner, corpus drift, code-switching."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from geoclimate_spark.operators import codeswitch as CS
from geoclimate_spark.operators import drift as DR
from geoclimate_spark.operators import postings as PO


def test_posting_gamma_costs_hand_case(spark):
    # term 'x' in docs 0..4 (gaps 1,1,1,1,1 -> 1 bit each); term 'y' in
    # docs {0, 4} (gaps 1, 4 -> 1 + 5 bits); term 'z' only in doc 3
    # (gap 4 -> 5 bits)
    rows = [(0, "x y"), (1, "x"), (2, "x"), (3, "x z"), (4, "x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.term: r for r in PO.posting_size_plan(df, topk=10).collect()}
    assert (got["x"].df, got["x"].postings_bits) == (5, 5)
    assert (got["y"].df, got["y"].postings_bits) == (2, 6)
    assert (got["z"].df, got["z"].postings_bits) == (1, 5)
    assert got["y"].bits_per_posting_milli == 3000


def test_posting_plan_topk_is_heap_not_global_sort(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (PO.posting_size_plan(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_drift_zero_for_identical_batches(spark):
    # ids 0..5 all with identical text -> every batch has the same bag
    rows = [(i, "alpha beta gamma delta") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = DR.token_drift_report(df).collect()
    assert len(out) == 6
    assert all(r.drift_bits == 0 for r in out)
    assert all(r.n_tokens_a == 8 for r in out)


def test_drift_positive_for_disjoint_vocab(spark):
    # batch 0 (ids 0,3) speaks one vocabulary, batches 1-2 another
    rows = [(i, "red green blue " * 5 if i % 3 == 0
             else "rot gruen blau " * 5) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.batch_a, r.batch_b): r.drift_bits
           for r in DR.token_drift_report(df).collect()}
    assert out[(0, 1)] > 0 and out[(1, 0)] > 0
    # batches 1 and 2 share a vocabulary: drift between them ~ 0
    assert abs(out[(1, 2)]) <= out[(0, 1)] // 4


def test_code_switch_hand_case(spark):
    # two artificial 'languages' with disjoint character bigrams; doc 7
    # mixes them half/half at the 16-token chunk boundary
    aa = " ".join(["aaa"] * 16)
    bb = " ".join(["bbb"] * 16)
    rows = [(0, aa, "aa"), (3, aa, "aa"), (6, bb, "bb"), (9, bb, "bb"),
            (1, aa, "aa"), (4, bb, "bb"),
            (7, aa + " " + bb, "aa")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in CS.code_switch_scores(df).collect()}
    assert got[1].n_chunk_langs == 1 and got[1].switch_millis == 0
    assert got[4].majority_lang == "bb" and got[4].switch_millis == 0
    assert got[7].n_chunks == 2 and got[7].n_chunk_langs == 2
    assert got[7].majority_millis == 500 and got[7].switch_millis == 500


def test_code_switch_plan_broadcasts_profiles(spark):
    rows = [(i, "aaa bbb ccc", "aa") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    plan = (CS.code_switch_scores(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def _duck_with_docs(rows, cols="doc_id BIGINT, text VARCHAR"):
    con = duckdb.connect()
    con.execute(f"CREATE TABLE documents ({cols})")
    con.executemany(
        "INSERT INTO documents VALUES (" + ", ".join("?" * (cols.count(",") + 1)) + ")",
        rows)
    return con


def _parity(spark_df, con, sql):
    import numpy as np
    a = spark_df.toPandas()
    b = con.execute(sql).fetchdf()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    for c in cols:
        if a[c].dtype == object:
            assert (a[c].values == b[c].values).all(), c
        else:
            av = a[c].to_numpy(dtype="float64", na_value=np.nan)
            bv = b[c].to_numpy(dtype="float64", na_value=np.nan)
            assert np.array_equal(av, bv, equal_nan=True), c


def test_posting_plan_duckdb_parity(spark):
    rows = [(i, f"w{i % 7} shared tail{i % 3} x" * (1 + i % 2))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = _duck_with_docs(rows)
    _parity(PO.posting_size_plan(df, topk=20), con,
            PO.posting_size_plan_sql(topk=20))
    con.close()


def test_drift_duckdb_parity(spark):
    rows = [(i, ("alpha beta" if i % 3 == 0 else "gamma delta") + f" t{i % 5}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = _duck_with_docs(rows)
    _parity(DR.token_drift_report(df), con, DR.token_drift_report_sql())
    con.close()


def test_code_switch_duckdb_parity(spark):
    aa, bb = " ".join(["aaa"] * 16), " ".join(["bbb"] * 16)
    rows = [(i, aa if i % 2 == 0 else bb, "aa" if i % 2 == 0 else "bb")
            for i in range(12)] + [(12, aa + " " + bb, "aa")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    con = _duck_with_docs(rows,
                          "doc_id BIGINT, text VARCHAR, lang VARCHAR")
    _parity(CS.code_switch_scores(df), con, CS.code_switch_scores_sql())
    con.close()


def test_drift_rejects_single_batch(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        DR.token_drift_report(df, n_batches=1)
    with pytest.raises(ValueError):
        DR.token_drift_report_sql(n_batches=1)
