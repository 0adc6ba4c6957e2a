"""Mojibake repair: engine/oracle parity + repair semantics."""
from __future__ import annotations

import hashlib

import duckdb
import pytest

from geoclimate_spark.operators import mojibake as M

BASE = "plain ascii body with ordinary words only"
# ids: 60 fires all three branches; 61 clean; 3 quotes; 4 accents;
# 5 NBSP+dashes; 15 quotes+NBSP; 16 accents+quotes? (16%3!=0 → accents only)
IDS = (60, 61, 3, 4, 5, 15, 16, 7)
DOCS = [(i, BASE, "en") for i in IDS]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    return df, con


def test_parity_and_repair(frames):
    df, con = frames
    got = M.repair_mojibake(df).toPandas()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(M.repair_mojibake_sql("docs")).fetchdf()[cols]\
        .sort_values(cols).reset_index(drop=True).astype(got.dtypes.to_dict())
    assert got.equals(want), got.compare(want) if len(got) == len(want) \
        else (len(got), len(want))

    by_id = {r.doc_id: r for r in got.itertuples()}
    # clean docs (61, 7): nothing detected, fixed == raw
    for i in (61, 7):
        assert by_id[i].n_bad == 0 and by_id[i].had_mojibake == 0
        assert by_id[i].fixed_len == by_id[i].raw_len
        assert by_id[i].fixed_md5 == hashlib.md5(BASE.encode()).hexdigest()
    # %3 branch: ’ “ … → 3 artifacts
    assert by_id[3].n_bad == 3
    # %4 branch: ï é é ñ → 4 artifacts
    assert by_id[4].n_bad == 4
    # %5 branch: 2×NBSP + – + — → 4 artifacts
    assert by_id[5].n_bad == 4
    # 60 fires all three: 3 + 4 + 4
    assert by_id[60].n_bad == 11 and by_id[60].had_mojibake == 1
    # every 3-char artifact shrinks by 2 chars, every 2-char by 1
    assert by_id[3].raw_len - by_id[3].fixed_len == 3 * 2
    assert by_id[4].raw_len - by_id[4].fixed_len == 4 * 1
    assert by_id[5].raw_len - by_id[5].fixed_len == 2 * 1 + 2 * 2


def test_repair_matches_python_reference(frames):
    """The repaired text equals a pure-Python replay of the same table."""
    df, _ = frames
    spark = df.sparkSession
    rows = {r.doc_id: r for r in
            M.with_synthetic_mojibake(df).select("doc_id", "raw").collect()}
    got = {r.doc_id: r.fixed_md5
           for r in M.repair_mojibake(df).collect()}
    for i, r in rows.items():
        fixed = r.raw
        for bad, good in M._ARTIFACTS:
            fixed = fixed.replace(bad, good)
        assert got[i] == hashlib.md5(fixed.encode()).hexdigest()
