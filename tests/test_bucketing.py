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


def test_bbox_cell_join_equals_bruteforce(spark):
    """Property check on the covering equi-join every rect x rect spatial
    join rides: for deterministic pseudo-random integer bboxes (mixed
    sizes, some spanning many cells, some touching), the candidate pair
    set equals the O(n*m) closed-bbox-intersection reference EXACTLY —
    each qualifying pair once, none dropped, none duplicated."""
    from pyspark.sql import functions as F
    from geoclimate_spark.operators.covering import bbox_cell_join, CELL_E6

    def boxes(salt, n, scale):
        # LCG-style spread; sizes from tiny to multi-cell (scale > CELL_E6)
        rows = []
        for i in range(n):
            x0 = (i * 2654435761 + salt) % 300_000_000 - 150_000_000
            y0 = (i * 40503 * 65537 + 7) % 160_000_000 - 80_000_000
            w = (i * 97 + 13) % scale + 1
            h = (i * 31 + 5) % scale + 1
            rows.append((i, x0, y0, x0 + w, y0 + h))
        return rows

    a_rows = boxes(101, 60, 3 * CELL_E6)
    b_rows = boxes(20_202, 50, CELL_E6 // 2)
    # one exact-touch pair (closed-interval contract) and one exact overlap
    b_rows.append((990, a_rows[0][3], a_rows[0][2], a_rows[0][3] + 5, a_rows[0][4]))
    b_rows.append((991, a_rows[1][1], a_rows[1][2], a_rows[1][3], a_rows[1][4]))
    a = spark.createDataFrame(a_rows, "aid long, ax0 long, ay0 long, ax1 long, ay1 long")
    b = spark.createDataFrame(b_rows, "bid long, bx0 long, by0 long, bx1 long, by1 long")
    got = sorted((r.aid, r.bid) for r in bbox_cell_join(
        a, ("ax0", "ay0", "ax1", "ay1"),
        b, ("bx0", "by0", "bx1", "by1")).select("aid", "bid").collect())
    exp = sorted((ra[0], rb[0]) for ra in a_rows for rb in b_rows
                 if ra[1] <= rb[3] and rb[1] <= ra[3]
                 and ra[2] <= rb[4] and rb[2] <= ra[4])
    assert got == exp
    assert len(got) == len(set(got))  # no duplicate pairs slipped through
