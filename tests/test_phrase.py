"""Phrase search: verbatim-match semantics (overlaps, duplicate terms,
multi-occurrence, negatives), parity, broadcast-before-shuffle plan."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import phrase as P

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the cat sat and the cat sat again", "en"),   # two occurrences
    (2, "cat the sat", "en"),                          # scrambled → no match
    (3, "buffalo buffalo buffalo", "en"),              # overlapping dups
    (4, "THE  Cat   SAT", "en"),                       # normalization
    (5, "", "en"),
]
QUERIES = [(1, "the cat sat"), (2, "buffalo buffalo"), (3, "dog")]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    rows = P.phrase_search(df, QUERIES).collect()
    return df, {(r.query_id, r.doc_id): r for r in rows}


def test_match_semantics(result):
    _, by = result
    assert by[(1, 0)].n_occ == 1 and by[(1, 0)].first_pos == 1
    assert by[(1, 1)].n_occ == 2 and by[(1, 1)].first_pos == 1
    assert (1, 2) not in by                      # order matters
    assert by[(1, 4)].n_occ == 1                 # case/whitespace normalized
    # "buffalo buffalo" occurs twice in "buffalo buffalo buffalo" (overlap)
    assert by[(2, 3)].n_occ == 2
    assert not any(q == 3 for q, _ in by)        # "dog" matches nothing
    assert not any(d == 5 for _, d in by)        # empty doc matches nothing


def test_parity(spark, result):
    df, by = result
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    want = con.execute(P.phrase_search_sql(QUERIES, "docs")).fetchdf()
    exp = {(int(r.query_id), int(r.doc_id)): (int(r.n_occ), int(r.first_pos))
           for r in want.itertuples()}
    got = {k: (r.n_occ, r.first_pos) for k, r in by.items()}
    assert got == exp


def test_plan_broadcast_before_shuffle(spark, result):
    df, _ = result
    plan = (P.phrase_search(df, QUERIES)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the postings-side exchange must come AFTER the broadcast term filter:
    # no shuffle of raw corpus postings (first Exchange keys include qid)
    first_ex = plan.index("Exchange hashpartitioning")
    assert "qid" in plan[first_ex:first_ex + 200]


def test_oracle_sql_escapes_apostrophes(spark):
    """ADVICE r4: phrase terms with apostrophes must produce valid SQL."""
    con = duckdb.connect()
    con.execute("create view documents as select 1 as doc_id,"
                " 'it''s a test it''s fine' as text")
    sql = P.phrase_search_sql([(1, "it's a"), (2, "o'clock sharp")])
    got = sorted(con.execute(sql).fetchall())
    con.close()
    assert got == [(1, 1, 1, 1)]
