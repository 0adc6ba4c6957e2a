"""Split-leakage audit: parity + planted cross-split near-dup detection."""
from __future__ import annotations

import hashlib

import duckdb
import pytest

from geoclimate_spark.operators import curation as C


def _split_of(i: int, seed: int = 7) -> str:
    part = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16) % 10000
    return "train" if part < 8000 else ("val" if part < 9000 else "test")


def _pick(split: str, start: int, avoid: set) -> int:
    i = start
    while _split_of(i) != split or i in avoid:
        i += 1
    avoid.add(i)
    return i


LONG = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi")


@pytest.fixture(scope="module")
def frames(spark):
    used: set = set()
    t1 = _pick("train", 0, used)
    v1 = _pick("val", 0, used)        # near-dup of t1 → leakage
    t2 = _pick("train", 100, used)
    t3 = _pick("train", t2 + 1, used)  # near-dup of t2 → same-split, benign
    s1 = _pick("test", 200, used)      # unique text, no pair
    docs = [
        (t1, LONG, "en"),
        (v1, LONG + " omega", "en"),
        (t2, LONG.replace("alpha", "zz"), "en"),
        (t3, LONG.replace("alpha", "zz") + " omega", "en"),
        (s1, "totally different words nothing shared here at all époque", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", docs)
    return df, con, (t1, v1, t2, t3)


def test_parity_and_detection(frames):
    df, con, (t1, v1, t2, t3) = frames
    got = C.split_leakage(df).toPandas()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(C.split_leakage_sql(doc_rel="docs")).fetchdf()[cols]\
        .sort_values(cols).reset_index(drop=True).astype(g.dtypes.to_dict())
    assert g.equals(want), g.compare(want) if len(g) == len(want) \
        else (len(g), len(want))

    pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    # the cross-split twin is flagged; the same-split twin is not
    assert (min(t1, v1), max(t1, v1)) in pairs
    assert (min(t2, t3), max(t2, t3)) not in pairs
    for r in got.itertuples():
        assert r.split_a != r.split_b
        assert r.jaccard >= 0.8
