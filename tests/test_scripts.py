"""Unicode-script detection: known-count rows, argmax tie-break, parity."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import scripts as S

DOCS = [
    (0, "hello world", "en"),        # hits every snippet residue (0 % k == 0)
    (1, "plain ascii only", "en"),   # no injection (1 not divisible)
    (3, "пример latin преобладает", "ru"),  # pre-existing Cyrillic + m3 snippet
    (5, "abc", "en"),                # Han snippet, repeat 2 (5 % 2 == 1)
    (7, "", "el"),                   # Greek snippet only → dominant greek
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    return df, con


def test_parity(frames):
    df, con = frames
    got = S.script_profile(S.with_synthetic_scripts(df)).toPandas()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(S.script_profile_sql("docs")).fetchdf()[cols] \
        .sort_values(cols).reset_index(drop=True).astype(g.dtypes.to_dict())
    assert g.equals(want), g.compare(want) if len(g) == len(want) \
        else (len(g), len(want))


def test_counts_and_dominance(frames):
    df, _ = frames
    by = {r.doc_id: r for r in
          S.script_profile(S.with_synthetic_scripts(df)).collect()}

    # doc 1: untouched ASCII → single-script latin, full share
    r1 = by[1]
    assert (r1.dom_script, r1.n_scripts, r1.dom_share_millis) == ("latin", 1, 1000)
    assert r1.n_latin == len("plainasciionly")

    # doc 7: empty base + ' γειά σου κόσμε'×2 (repeat 1 + 7%2) → pure greek
    r7 = by[7]
    assert (r7.dom_script, r7.n_greek, r7.n_latin) == ("greek", 24, 0)

    # doc 5: 'abc' + ' 漢字處理文本'×2 → han dominates 12 vs 3 latin
    r5 = by[5]
    assert (r5.dom_script, r5.n_han, r5.n_latin) == ("han", 12, 3)
    assert r5.dom_share_millis == 12 * 1000 // 15

    # doc 0: divisible by 3,5,7 ... only residues where 0 % k == 0 → ALL six
    # snippets fire (0 is divisible by everything) → 7 scripts present
    r0 = by[0]
    assert r0.n_scripts == 7 and r0.n_latin == len("helloworld")

    # doc 3: Cyrillic both pre-existing and injected beats latin
    r3 = by[3]
    assert r3.dom_script == "cyrillic"
    assert r3.n_cyrillic > r3.n_latin > 0 and r3.n_scripts == 2


def test_tiebreak_priority(spark):
    # equal latin and cyrillic counts → first-in-priority-order (latin) wins
    df = spark.createDataFrame([(1, "abс" , "x")],  # 'с' is U+0441 cyrillic
                               "doc_id long, text string, lang string")
    row = S.script_profile(df.withColumn("mtext", df.text)).collect()[0]
    assert row.n_latin == 2 and row.n_cyrillic == 1
    df2 = spark.createDataFrame([(1, "aб", "x")],
                                "doc_id long, text string, lang string")
    row2 = S.script_profile(df2.withColumn("mtext", df2.text)).collect()[0]
    assert row2.n_latin == row2.n_cyrillic == 1
    assert row2.dom_script == "latin"
