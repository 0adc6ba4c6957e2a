"""Readability metrics: parity + hand-computed values on a known page."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import readability as R

# id 23: only the 8-word sentence line is injected (cf. test_qualityrules)
DOCS = [(23, "just three words", "en"),
        (2, "the cat sat on the mat the cat sat again", "en"),
        (101, "repeat repeat repeat repeat", "en")]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    return df, con


def test_parity_and_values(frames):
    df, con = frames
    got = R.readability_metrics(df).toPandas()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(R.readability_metrics_sql("docs")).fetchdf()[cols]\
        .sort_values(cols).reset_index(drop=True).astype(g.dtypes.to_dict())
    assert g.equals(want), g.compare(want) if len(g) == len(want) \
        else (len(g), len(want))

    by_id = {r.doc_id: r for r in got.itertuples()}
    # id 23 page: "just three words\nthis is sentence number 23 of the page."
    r = by_id[23]
    assert r.n_words == 11 and r.n_sents == 1
    assert r.n_types == 11  # all words distinct
    assert r.ttr_x1000 == 1000
    assert r.fk_milli == 206835 - (1015 * 11) // 1 - (84600 * r.n_syll) // 11
    # repetition-heavy doc has a low TTR
    rep = by_id[101]
    assert rep.ttr_x1000 < by_id[23].ttr_x1000
    # formula invariant holds row-by-row
    for r in got.itertuples():
        assert r.fk_milli == 206835 - (1015 * r.n_words) // r.n_sents \
            - (84600 * r.n_syll) // r.n_words
