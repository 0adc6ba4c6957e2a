"""CCNet perplexity terciles: decomposed-cumsum == naive-window parity,
equal-char-mass boundary rule, and determinism under ties."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import pplbucket

# two langs; enough docs that each lang gets all three buckets. Train slice
# for the underlying LM = doc_id % 3 == 0.
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the fire", "en"),
    (3, "the dog and the fox are friends near the warm den", "en"),
    (1, "the dog jumps over the fox near the fire", "en"),
    (2, "zxqj vwkp qqzz xjvw kpzx wqjz pxvk zzqw", "en"),
    (4, "the fox sleeps while the dog runs to the den", "en"),
    (5, "qqq zzz xxx vvv kkk www jjj ppp", "en"),
    (7, "the warm fire and the lazy dog and the quick fox", "en"),
    (6, "le chat dort pres du feu et le chien court vite", "fr"),
    (9, "le chien et le chat sont amis pres du feu", "fr"),
    (8, "le feu est chaud et le chat est content", "fr"),
    (10, "zz qq xx vv kk ww jj pp", "fr"),
    (11, "le chat court et le chien dort pres du feu chaud", "fr"),
    (13, "xp qz wv kj", "fr"),
    (14, None, "fr"),           # dropped (NULL text)
    (16, "a", "fr"),            # dropped (no bigram)
]


@pytest.fixture(scope="module")
def assignments(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    return sorted(
        (r["doc_id"], r["lang"], r["ppl_key"], r["cum_chars"],
         r["total_chars"], r["bucket"])
        for r in pplbucket.ppl_tercile_assignments(df).collect())


def test_matches_naive_oracle(assignments):
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    want = sorted(map(tuple, con.execute(
        pplbucket.ppl_tercile_sql(doc_rel="docs")).fetchall()))
    assert assignments == want


def test_tercile_rule_and_order(assignments):
    # per lang: cum is a strictly increasing prefix of char mass in
    # (ppl_key, doc_id) order; buckets are monotone head<=middle<=tail
    # and the boundary rule 3*cum<=total / <=2*total holds row-by-row.
    rank = {"head": 0, "middle": 1, "tail": 2}
    by_lang: dict[str, list] = {}
    for row in assignments:
        by_lang.setdefault(row[1], []).append(row)
    assert set(by_lang) == {"en", "fr"}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (r[2], r[0]))  # (ppl_key, doc_id)
        total = rows[0][4]
        assert all(r[4] == total for r in rows)
        assert rows[-1][3] == total  # cum ends at total
        prev_cum, prev_b = 0, 0
        for _, _, _, cum, _, bucket in rows:
            assert cum > prev_cum
            assert rank[bucket] >= prev_b
            if cum * 3 <= total:
                assert bucket == "head"
            elif cum * 3 <= 2 * total:
                assert bucket == "middle"
            else:
                assert bucket == "tail"
            prev_cum, prev_b = cum, rank[bucket]
        assert {b for *_, b in rows} == {"head", "middle", "tail"}


def test_dropped_docs_absent(assignments):
    ids = {r[0] for r in assignments}
    assert 14 not in ids and 16 not in ids
    assert len(ids) == len(DOCS) - 2
