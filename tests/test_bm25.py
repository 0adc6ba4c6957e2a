"""BM25 retrieval: engine/oracle parity and ranking semantics."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import bm25

DOCS = [
    (1, "apple banana apple cherry"),          # tf(apple)=2, short
    (2, "apple banana banana banana cherry durian elderberry fig grape"),
    (3, "cherry cherry cherry cherry"),
    (4, "durian"),                              # rare term, tiny doc
    (5, "apple apple apple apple apple apple"),  # tf saturation case
    (6, "banana fig grape kiwi lemon mango"),
    (7, None),
]
QUERIES = [(0, ["apple"]), (1, ["durian", "cherry"]),
           (2, ["apple", "banana", "kiwi"])]


@pytest.fixture(scope="module")
def ranked(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25.bm25_topk(df, QUERIES, k=3).collect()
    return sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                  for r in rows)


def test_matches_oracle(spark, ranked):
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", DOCS)
    want = sorted(map(tuple, con.execute(
        bm25.bm25_topk_sql(QUERIES, k=3, doc_rel="docs")).fetchall()))
    assert ranked == want


def test_ranking_semantics(ranked):
    by_q = {}
    for q, rank, doc, score in ranked:
        by_q.setdefault(q, []).append((rank, doc, score))
    # q0 'apple': doc 5 (highest tf, pure apple) beats doc 1 beats doc 2
    assert [d for _, d, _ in sorted(by_q[0])] == [5, 1, 2]
    # q1 'durian cherry': the tf-saturated all-cherry doc 3 edges out the
    # rare-term doc 4 (17.5 vs 16.3 — higher idf loses to 4x tf here);
    # both beat doc 2, which matches both terms once in a long doc
    assert [d for _, d, _ in sorted(by_q[1])] == [3, 4, 2]
    # scores are positive and strictly ordered within a query
    for q, rows in by_q.items():
        scores = [s for _, _, s in sorted(rows)]
        assert all(s > 0 for s in scores), q
        assert scores == sorted(scores, reverse=True), q


def test_topk_bound(ranked):
    from collections import Counter
    c = Counter(q for q, *_ in ranked)
    assert all(v <= 3 for v in c.values())
