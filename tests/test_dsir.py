"""DSIR importance weights: engine/oracle parity + separation semantics."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import dsir as D

# target slice = doc_id % 7 == 0. Two vocabularies: "sci" (target-style)
# and "web" (raw-style). Raw-pool docs alternate styles, so DSIR must
# score the sci-styled raw docs above the web-styled ones.
SCI = "the theorem states that every prime admits a unique factorization"
WEB = "click here to buy now limited offer free shipping on all orders"
DOCS = (
    [(i * 7, SCI, "en") for i in range(1, 9)]            # target slice
    + [(100 + 2 * i, SCI, "en") for i in range(6)]       # sci raw docs
    + [(101 + 2 * i, WEB, "en") for i in range(6)]       # web raw docs
    + [(200, "", "en"), (201, "solo", "en")]             # edge: empty/1-word
)
DOCS = [d for d in DOCS if d[0] % 7 != 0 or d[1] == SCI]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    return df, con


def test_parity_and_separation(frames):
    df, con = frames
    got = D.dsir_importance(df).toPandas()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(D.dsir_importance_sql("docs")).fetchdf()[cols]\
        .sort_values(cols).reset_index(drop=True).astype(got.dtypes.to_dict())
    assert got.equals(want), got.compare(want) if len(got) == len(want) \
        else (len(got), len(want))

    by_id = {r.doc_id: r for r in got.itertuples()}
    # empty doc has no grams → absent; 1-word doc scores on its unigram
    assert 200 not in by_id and 201 in by_id and by_id[201].n_grams == 1
    sci_raw = [by_id[100 + 2 * i] for i in range(6) if (100 + 2 * i) % 7]
    web_raw = [by_id[101 + 2 * i] for i in range(6) if (101 + 2 * i) % 7]
    # every sci raw doc outranks every web raw doc, and the selection
    # threshold separates them
    assert min(r.importance_bits for r in sci_raw) > \
        max(r.importance_bits for r in web_raw)
    assert all(r.selected == 1 for r in sci_raw)
    assert all(r.selected == 0 for r in web_raw)
    # identical text ⇒ identical score regardless of slice membership
    assert len({r.importance_bits for r in sci_raw}) == 1


def test_score_is_gram_sum(frames):
    """A doc's importance equals the sum of its grams' bucket weights —
    verified by scoring a doc that is the concatenation of two others."""
    df, _ = frames
    spark = df.sparkSession
    extra = spark.createDataFrame(
        [(300, SCI, "en"), (301, WEB, "en"), (302, f"{SCI} {WEB}", "en")],
        "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in
           D.dsir_importance(df.unionByName(extra)).collect()}
    # the concatenated doc adds one bridging bigram (last sci word +
    # first web word) beyond the two parts' grams
    assert got[302].n_grams == got[300].n_grams + got[301].n_grams + 1
    bridge = got[302].importance_bits \
        - got[300].importance_bits - got[301].importance_bits
    # the bridge bigram's weight is a single gram's worth of bits
    assert abs(bridge) <= 64


def test_xxhash64_fast_path_matches_selection(spark):
    """VERDICT r4 #9: the xxhash64 bucket hash (one codegen hash per gram
    occurrence instead of md5 digest+conv; ~5x faster measured) must
    produce an equivalent DSIR model: same plan shape, >= 99% identical
    per-doc selection on the fixture (a borderline doc may flip — any
    uniform hash is statistically equivalent, md5 stays the oracle
    default)."""
    import pytest as _pt
    from conftest import SF_SMOKE
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = {r.doc_id: r.selected
         for r in D.dsir_importance(docs).collect()}
    b = {r.doc_id: r.selected
         for r in D.dsir_importance(docs, bucket_hash="xxhash64").collect()}
    assert a.keys() == b.keys()
    agree = sum(1 for k in a if a[k] == b[k])
    assert agree >= 0.99 * len(a)
    with _pt.raises(ValueError):
        D.dsir_importance(docs, bucket_hash="sha1")
