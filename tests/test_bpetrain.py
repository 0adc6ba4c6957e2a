"""In-engine BPE merge training: engine/oracle parity and textbook
merge-learning behavior."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import bpetrain

DOCS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "wide wider widest low new"),
    (4, "aaaa bb aaaa"),     # repeated-symbol words (overlap-count cases)
    (5, None),
]


@pytest.fixture(scope="module")
def merges(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return sorted(tuple(r) for r in bpetrain.bpe_train(df, 6).collect())


def test_matches_oracle(merges):
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", DOCS)
    want = sorted(map(tuple, con.execute(
        bpetrain.bpe_train_sql(6, doc_rel="docs")).fetchall()))
    assert merges == want


def test_learns_stems_and_compresses(merges):
    # (a,a) from doc 4 ties (l,o) at 6 — the (left ASC) tie-break picks it
    # first; the frequent stems follow: l+o, lo+w (count 6 each from the
    # 'low*' family)
    assert merges[0][1:4] == ("a", "a", 6)
    assert merges[1][1:4] == ("l", "o", 6)
    assert merges[2][1:4] == ("lo", "w", 6)
    # the compression curve (corpus tokens after each merge) is strictly
    # decreasing — every merge round removes pair_count symbols
    toks = [m[4] for m in merges]
    assert toks == sorted(toks, reverse=True) and len(set(toks)) == len(toks)
    # token drop per round == that round's pair count AS MERGED (greedy
    # left-to-right can merge fewer than the overlap-counted pair_count,
    # e.g. (a,a) in 'aaaa'), so drop <= pair_count
    prev = None
    for rnd, l, r, cnt, tok in merges:
        if prev is not None:
            assert prev - tok <= cnt
        prev = tok


def test_overlap_merge_is_greedy_left(spark):
    # 'aaaa' with merge (a,a): textbook greedy-left yields [aa, aa] after
    # one merge round, never [a, aaa] or a double-merge within the round
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    rows = sorted(tuple(r) for r in bpetrain.bpe_train(df, 2).collect())
    # round 1: (a, a) appears 3x per word (overlap-counted) x 2 words = 6;
    # after merging, each word is [aa, aa] -> 4 corpus tokens
    assert rows[0][1:] == ("a", "a", 6, 4)
    # round 2 merges (aa, aa) -> one symbol per word
    assert rows[1][1:] == ("aa", "aa", 2, 2)
