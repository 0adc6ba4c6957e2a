"""Content-defined chunking: shift-robustness (the property CDC exists
for), boundary determinism, coverage, parity with the SQL oracle."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import cdc as C

BODY = ("it was the best of times it was the worst of times it was the age "
        "of wisdom it was the age of foolishness it was the epoch of belief "
        "it was the epoch of incredulity it was the season of light it was "
        "the season of darkness it was the spring of hope it was the winter "
        "of despair we had everything before us we had nothing before us")

DOCS = [
    (0, BODY, "en"),
    # same body with an inserted prefix — every chunk except the first
    # should re-align (that is what content-DEFINED boundaries buy)
    (1, "breaking news update " + BODY, "en"),
    (2, "", "en"),
    (3, "tiny", "en"),
]


@pytest.fixture(scope="module")
def chunks(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    return df, C.cdc_dedup(df).collect()


def test_coverage_and_boundaries(chunks):
    _, rows = chunks
    per = {}
    for r in rows:
        per.setdefault(r.doc_id, []).append(r)
    assert 2 not in per                      # empty doc → nothing
    assert len(per[3]) == 1                  # short doc → one chunk
    for did in (0, 1, 3):
        cs = sorted(per[did], key=lambda r: r.chunk_id)
        assert cs[0].start == 1
        total = sum(r.n_chars for r in cs)
        exp = len(DOCS[did][1]) if did != 1 else len(DOCS[1][1])
        assert total == exp                  # chunks tile the text exactly
        for a, b in zip(cs, cs[1:]):
            assert b.start == a.start + a.n_chars


def test_shift_robustness(chunks):
    _, rows = chunks
    h0 = {r.chunk_md5 for r in rows if r.doc_id == 0}
    h1 = {r.chunk_md5 for r in rows if r.doc_id == 1}
    shared = h0 & h1
    # the inserted prefix may perturb the first window, but the bulk of
    # the chunk stream re-synchronizes: most of doc 0's chunks reappear
    assert len(shared) >= max(1, len(h0) - 2), (len(h0), len(shared))
    # and those shared chunks are flagged as duplicates (n_occ >= 2)
    for r in rows:
        if r.chunk_md5 in shared:
            assert r.n_occ >= 2


def test_parity(spark, chunks):
    df, rows = chunks
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    import pandas as pd
    got = (pd.DataFrame([r.asDict() for r in rows]))
    want = con.execute(C.cdc_dedup_sql(rel="docs")).fetchdf()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True).astype(
        g.dtypes.to_dict())
    assert g.equals(w)


def test_mask_bits_controls_chunk_size(spark):
    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string, lang string")
    coarse = C.cdc_chunks(df, mask_bits=8).count()
    fine = C.cdc_chunks(df, mask_bits=4).count()
    assert fine >= coarse
