"""Recrawl priority: scoring semantics on a hand-built crawl log + parity
+ the top-k plan shape."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import snapshot as S

T1, T2 = 1000 * S._KEY_SCALE // S._KEY_SCALE * 0 + 1000, 2000  # plain ints

# crawl log: (crawl_id, raw_url, fetch_epoch, host)
# hot.example.com: both pages refetched after t1 (all updated, stale-ish)
# cold.example.com: fetched once before t1, never again (unchanged, very stale)
# new.example.com: appears only after t1 (all added, fresh)
CRAWLS = [
    (1, "http://hot.example.com/a", 500, "hot.example.com"),
    (2, "http://hot.example.com/a", 1500, "hot.example.com"),
    (3, "http://hot.example.com/b", 900, "hot.example.com"),
    (4, "http://hot.example.com/b", 1100, "hot.example.com"),
    (5, "http://cold.example.com/x", 100, "cold.example.com"),
    (6, "http://cold.example.com/y", 200, "cold.example.com"),
    (7, "http://new.example.com/p", 1900, "new.example.com"),
]
SCHEMA = "crawl_id long, raw_url string, fetch_epoch long, host string"


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(CRAWLS, SCHEMA)
    return df, {r.host: r for r in
                S.recrawl_priority(df, k=10, t1=T1, t2=T2).collect()}


def test_class_counts(result):
    _, by = result
    hot, cold, new = (by["hot.example.com"], by["cold.example.com"],
                      by["new.example.com"])
    assert (hot.n_urls, hot.n_added, hot.n_updated, hot.n_unchanged) == (2, 0, 2, 0)
    assert (cold.n_urls, cold.n_added, cold.n_updated, cold.n_unchanged) == (2, 0, 0, 2)
    assert (new.n_urls, new.n_added, new.n_updated, new.n_unchanged) == (1, 1, 0, 0)


def test_scores(result):
    _, by = result
    hot, cold, new = (by["hot.example.com"], by["cold.example.com"],
                      by["new.example.com"])
    # hot: change 1000‰, ages (2000-1500, 2000-1100) → mean 700 → score 700000
    assert (hot.change_millis, hot.mean_age, hot.score) == (1000, 700, 700000)
    # cold: nothing changed → score 0, regardless of staleness
    assert (cold.change_millis, cold.score) == (0, 0)
    assert cold.mean_age == (1900 + 1800) // 2
    # new: all added, age 100 → score 1000*100
    assert (new.change_millis, new.score) == (1000, 100000)


def test_ordering(result):
    df, _ = result
    hosts = [r.host for r in
             S.recrawl_priority(df, k=2, t1=T1, t2=T2).collect()]
    assert hosts == ["hot.example.com", "new.example.com"]


def test_parity(spark, result):
    df, _ = result
    con = duckdb.connect()
    con.execute("create table crawls (crawl_id bigint, raw_url varchar,"
                " fetch_epoch bigint, host varchar)")
    con.executemany("insert into crawls values (?, ?, ?, ?)", CRAWLS)
    got = (S.recrawl_priority(df, k=10, t1=T1, t2=T2).toPandas()
           .sort_values("host").reset_index(drop=True))
    want = con.execute(
        S.recrawl_priority_sql("SELECT * FROM crawls", 10, T1, T2)) \
        .fetchdf().sort_values("host").reset_index(drop=True)
    cols = sorted(got.columns)
    assert got[cols].equals(want[cols].astype(got[cols].dtypes.to_dict()))


def test_plan_topk(spark, result):
    df, _ = result
    plan = (S.recrawl_priority(df, k=10, t1=T1, t2=T2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_fetch_budget_sums_to_budget(spark, result):
    df, _ = result
    # odd prime budget → remainder seats actually exercised
    rows = S.crawl_fetch_budget(df, budget=997, t1=T1, t2=T2).collect()
    assert sum(r.fetch_quota for r in rows) == 997  # exact apportionment
    # at a budget >> total weight, the n_urls floor yields every host a
    # nonzero quota (the floor is PROPORTIONAL, not a guaranteed seat)
    big = {r.host: r for r in
           S.crawl_fetch_budget(df, budget=10_000_000, t1=T1, t2=T2).collect()}
    assert big["cold.example.com"].fetch_quota > 0
    assert big["hot.example.com"].fetch_quota > big["cold.example.com"].fetch_quota
    assert sum(r.fetch_quota for r in big.values()) == 10_000_000


def test_fetch_budget_parity(spark, result):
    df, _ = result
    con = duckdb.connect()
    con.execute("create table crawls (crawl_id bigint, raw_url varchar,"
                " fetch_epoch bigint, host varchar)")
    con.executemany("insert into crawls values (?, ?, ?, ?)", CRAWLS)
    got = (S.crawl_fetch_budget(df, budget=997, t1=T1, t2=T2).toPandas()
           .sort_values("host").reset_index(drop=True))
    want = con.execute(S.crawl_fetch_budget_sql(
        "SELECT * FROM crawls", 997, T1, T2)).fetchdf() \
        .sort_values("host").reset_index(drop=True)
    cols = sorted(got.columns)
    assert got[cols].equals(want[cols].astype(got[cols].dtypes.to_dict()))
