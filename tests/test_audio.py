"""Audio constellation matching: self-retrieval, shifted-copy alignment,
tie-break, parity with the md5-arithmetic oracle."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from geoclimate_spark.operators import audio as A
from geoclimate_spark.sources import media as M

N = 40
DOCS = [(i, "t", "en") for i in range(N)]


@pytest.fixture(scope="module")
def landmarks(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    lm = A.audio_landmarks(M.synth_media(df)).persist()
    lm.count()
    return df, lm


def test_self_retrieval_wins(landmarks):
    _, lm = landmarks
    # query doc 23 (n_frames = 1 + 23 % 24 = 24), frames 5..15
    rows = A.snippet_match(lm, 23, 5, 15).collect()
    by = {r.doc_id: r for r in rows}
    assert 23 in by
    top = max(rows, key=lambda r: r.votes)
    assert top.doc_id == 23 and top.best_offset == 5
    # self-match votes == all query landmarks that fit in the window
    q_lms = lm.where((F.col("doc_id") == 23) & (F.col("f") >= 5)
                     & (F.col("f") < 15)).count()
    assert by[23].votes == q_lms


def test_offset_alignment(landmarks):
    _, lm = landmarks
    # shift the query window: the self-match offset follows it
    r = {x.doc_id: x for x in A.snippet_match(lm, 23, 8, 16).collect()}
    assert r[23].best_offset == 8


def test_votes_bounded(landmarks):
    _, lm = landmarks
    rows = A.snippet_match(lm, 23, 5, 15).collect()
    q_lms = lm.where((F.col("doc_id") == 23) & (F.col("f") >= 5)
                     & (F.col("f") < 15)).count()
    assert all(r.votes <= q_lms for r in rows)


def test_parity(spark, landmarks):
    df, lm = landmarks
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    got = A.snippet_match(lm, 23, 5, 15).toPandas()
    want = con.execute(A.snippet_match_sql(23, 5, 15, doc_rel="docs")).fetchdf()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True).astype(
        g.dtypes.to_dict())
    assert g.equals(w)
