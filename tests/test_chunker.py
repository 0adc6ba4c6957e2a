"""Token-window chunking: coverage/overlap invariants + engine/oracle parity."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import chunker as C

DOCS = [
    (0, "", "en"),                                   # empty → no chunks
    (1, "one", "en"),                                # 1 token → one chunk
    (2, " ".join(f"t{i}" for i in range(8)), "en"),  # == window → one chunk
    (3, " ".join(f"w{i}" for i in range(9)), "en"),  # window+1 → two chunks
    (4, " ".join(f"x{i}" for i in range(50)), "en"), # long → many chunks
    (5, "  A  B\tC  ", "en"),                        # normalization applies
]
W, S = 8, 6


@pytest.fixture(scope="module")
def chunks(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    return C.chunk_documents(df, window=W, stride=S).collect()


def test_parity(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    got = C.chunk_documents(df, window=W, stride=S).toPandas()
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(C.chunk_documents_sql(W, S, "docs")).fetchdf()[cols] \
        .sort_values(cols).reset_index(drop=True).astype(g.dtypes.to_dict())
    assert g.equals(want)


def test_chunk_counts(chunks):
    per = {}
    for r in chunks:
        per.setdefault(r.doc_id, []).append(r)
    assert 0 not in per                       # empty doc → no rows
    assert len(per[1]) == 1 and per[1][0].chunk_text == "one"
    assert len(per[2]) == 1                   # exactly window tokens
    assert len(per[3]) == 2                   # window+1 → ceil((9-8)/6)+1
    assert len(per[4]) == 1 + (50 - W + S - 1) // S


def test_coverage_and_overlap(chunks):
    rows = sorted((r for r in chunks if r.doc_id == 4),
                  key=lambda r: r.chunk_id)
    # every token position covered, consecutive chunks overlap by W-S
    assert rows[0].tok_start == 1 and rows[-1].tok_end == 50
    for a, b in zip(rows, rows[1:]):
        assert b.tok_start == a.tok_start + S
        assert a.tok_end - b.tok_start + 1 == W - S  # exact overlap
    for r in rows:
        assert r.n_toks == r.tok_end - r.tok_start + 1
        assert len(r.chunk_text.split(" ")) == r.n_toks
    # chunk content matches the token span it claims
    toks = DOCS[4][1].split(" ")
    for r in rows:
        assert r.chunk_text == " ".join(toks[r.tok_start - 1:r.tok_end])


def test_normalization(chunks):
    (r,) = [r for r in chunks if r.doc_id == 5]
    assert r.chunk_text == "a b c" and r.n_toks == 3


def test_bad_params(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        C.chunk_documents(df, window=8, stride=0)
    with pytest.raises(ValueError):
        C.chunk_documents(df, window=8, stride=9)
