"""Gopher rules + C4 line filter: engine/oracle parity on adversarial rows,
rule semantics on hand-built pages."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import qualityrules as Q

# Hand-picked doc_ids exercising every injection branch:
# 0 → sentence+even+bullet+ellipsis+symbols+digits+js+css+lorem (all mod-0)
# 1 → starred-item branch; 3 → ellipsis; 4 → even+bullet; 5 → symbols;
# 6 → even+ellipsis+js; 7 → digits; 11 → css braces; 13 → starred+lorem;
# 77 → digits+css; 78 → even+ellipsis+js.
IDS = (0, 1, 2, 3, 4, 5, 6, 7, 11, 13, 77, 78)
BASE = ("the quick brown fox and the lazy dog keep running over a warm "
        "field of tall grass to reach the den in time is what they say")
DOCS = [(i, BASE, "en") for i in IDS] + [
    # symbol-heavy body: symbols*10 >= words → ok_symbols = 0
    (20, "## ## ## ## foo", "en"),
    # digit-only body: alpha fraction low → ok_alpha = 0
    (21, "11 22 33 44 55 66 77 88 99 10 12 14 16 18 19 23 25 27 29 31", "en"),
    # tiny body → ok_words = 0 (id 23 fires only the 8-word sentence
    # injection: odd, %3,%4-1,%5,%6,%7,%11,%13 all non-zero)
    (23, "just three words", "en"),
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    return df, con


def _parity(eng_df, con, sql):
    got = eng_df.toPandas()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(sql).fetchdf()[cols].sort_values(cols)\
        .reset_index(drop=True).astype(got.dtypes.to_dict())
    assert got.equals(want), (got.compare(want) if len(got) == len(want)
                              else (len(got), len(want)))
    return got


def test_gopher_parity_and_rules(frames):
    df, con = frames
    got = _parity(Q.gopher_flags(df), con, Q.gopher_flags_sql("docs"))
    by_id = {r.doc_id: r for r in got.itertuples()}
    assert by_id[20].ok_symbols == 0 and by_id[20].keep == 0
    assert by_id[21].ok_alpha == 0 and by_id[21].keep == 0
    assert by_id[23].n_words == 11
    assert by_id[23].ok_words == 0 and by_id[23].keep == 0
    # the clean long doc with no hostile injection branch survives
    assert by_id[2].keep == 1
    # keep == AND of all rule flags, row by row
    for r in got.itertuples():
        assert r.keep == min(r.ok_words, r.ok_wlen, r.ok_symbols,
                             r.ok_bullets, r.ok_ellipsis, r.ok_alpha,
                             r.ok_stop)


def test_c4_parity_and_rules(frames):
    df, con = frames
    got = _parity(Q.c4_line_filter(df), con, Q.c4_line_filter_sql("docs"))
    by_id = {r.doc_id: r for r in got.itertuples()}
    # lorem-ipsum docs (id % 13 == 0) are dropped outright
    assert by_id[0].dropped == 1 and by_id[13].dropped == 1
    # curly-brace docs (id % 11 == 0) are dropped outright
    assert by_id[11].dropped == 1 and by_id[77].dropped == 1
    # id 2: base line (no terminal punct) is cut, sentence + even line kept
    assert by_id[2].dropped == 0 and by_id[2].n_kept == 2
    # id 3: ellipsis line ends in '.', so it IS kept (C4 keeps any
    # terminal-punct line) → sentence + ellipsis survive
    assert by_id[3].n_kept == 2 and by_id[3].dropped == 0
    # id 1: starred-item line has no terminal punct → only the numbered
    # sentence survives → below C4_MIN_KEPT_LINES → dropped
    assert by_id[1].n_kept == 1 and by_id[1].dropped == 1
    import hashlib
    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in got.itertuples():
        if r.dropped:
            assert r.clean_len == 0 and r.clean_md5 == empty_md5
        else:
            assert r.n_kept >= Q.C4_MIN_KEPT_LINES and r.clean_len > 0


def test_js_line_cut_not_doc_drop(frames):
    df, con = frames
    got = Q.c4_line_filter(df).toPandas()
    # id 78 is also %13 (lorem ipsum) → doc-dropped despite 3 good lines
    r78 = got[got.doc_id == 78].iloc[0]
    assert r78.dropped == 1 and r78.n_kept == 4  # lorem line itself kept
    # id 6: sentence + even + ellipsis lines kept; javascript line
    # (6%6==0) is line-cut, doc survives
    r6 = got[got.doc_id == 6].iloc[0]
    assert r6.dropped == 0 and r6.n_kept == 3
