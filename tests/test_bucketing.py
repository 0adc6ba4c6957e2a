"""Bucketed co-located join: correctness + shuffle-free plan assertion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoclimate_spark.sources import bucketing

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def warehouse(spark, tmp_path):
    # session warehouse is fixed at session start; use a unique db instead
    db = f"bdb_{abs(hash(str(tmp_path))) % 10**8}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_no_exchange(spark, warehouse):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    left = docs.select("doc_id", "lang")
    right = docs.select("doc_id", "n_chars")
    bucketing.save_bucketed(left, f"{warehouse}.docs_lang", "doc_id", 8)
    bucketing.save_bucketed(right, f"{warehouse}.docs_chars", "doc_id", 8)
    # disable broadcast so the planner exercises the big↔big bucketed path
    # (at sf0.001 everything fits the broadcast threshold otherwise)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketing.bucketed_join(spark, f"{warehouse}.docs_lang",
                                    f"{warehouse}.docs_chars", "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # correctness: same as the plain join
        expect = left.join(right, "doc_id").count()
        assert j.count() == expect == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_mismatched_buckets_still_correct(spark, warehouse):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bucketing.save_bucketed(docs.select("doc_id", "lang"),
                            f"{warehouse}.a8", "doc_id", 8)
    bucketing.save_bucketed(docs.select("doc_id", "n_chars"),
                            f"{warehouse}.b4", "doc_id", 4)
    j = bucketing.bucketed_join(spark, f"{warehouse}.a8",
                                f"{warehouse}.b4", "doc_id")
    # different bucket counts → a shuffle (of one side) is allowed; result
    # must still be exact
    assert j.count() == docs.count()
