"""LSH recall audit: parity + planted near-dup / far-pair semantics."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import dedup as D

BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles hang on the wall waiting for a gust of wind "
        "to knock one down and start the counting song all over again")

DOCS = (
    # planted near-dup pair: one-word edit of a long doc (both ids even
    # so the % 2 sample keeps the pair)
    [(0, BASE, "en"), (2, BASE.replace("green", "amber"), "en")]
    # identical twins → jaccard 1.0
    + [(4, "identical twin text content here repeated words", "en"),
       (6, "identical twin text content here repeated words", "en")]
    # unrelated docs
    + [(8 + 2 * i, f"completely unrelated document number {i} talking about "
        f"topic{i} and nothing else of note {i * 17}", "en")
       for i in range(10)]
    # odd ids must be excluded by the sample
    + [(1, BASE, "en"), (3, BASE, "en")]
)


@pytest.fixture(scope="module")
def report(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    return df, D.lsh_recall_report(df, threshold=0.8).collect()[0]


def test_semantics(report):
    _, r = report
    assert r.n_docs == len(DOCS) - 2          # odd ids sampled out
    assert r.n_truth >= 2                     # both planted pairs found
    assert r.n_hit <= min(r.n_truth, r.n_cand)
    assert 0 <= r.recall_millis <= 1000
    assert 0 <= r.cand_efficiency_millis <= 1000
    # identical twins MUST be caught by LSH (identical signatures)
    assert r.n_hit >= 1


def test_parity(spark, report):
    df, r = report
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    want = con.execute(
        D.lsh_recall_report_sql(0.8, doc_rel="docs")).fetchdf().iloc[0]
    got = r.asDict()
    for kcol in ("n_docs", "n_truth", "n_cand", "n_hit",
                 "recall_millis", "cand_efficiency_millis"):
        assert got[kcol] == int(want[kcol]), (kcol, got, dict(want))


def test_empty_sample(spark):
    # all-odd ids → empty sample → zero counts, guarded millis
    df = spark.createDataFrame([(1, "a b c", "en"), (3, "d e f", "en")],
                               "doc_id long, text string, lang string")
    r = D.lsh_recall_report(df, threshold=0.8).collect()[0]
    assert (r.n_docs, r.n_truth, r.n_cand, r.n_hit) == (0, 0, 0, 0)
    assert r.recall_millis == 1000 and r.cand_efficiency_millis == 1000
