"""PMI collocations: parity + a planted collocation wins the ranking."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import colloc as C

# "zig zag" always adjacent (a true collocation); "red" and "blue" are
# frequent but never adjacent to each other; filler words everywhere.
DOCS = [
    (i, f"red w{i % 4} blue zig zag red blue w{(i + 1) % 4} zig zag", "en")
    for i in range(10)
] + [(100 + i, "red green blue yellow red green blue", "en")
     for i in range(5)]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    return df, con


def test_parity_and_ranking(frames):
    df, con = frames
    got = C.pmi_collocations(df).toPandas()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(C.pmi_collocations_sql("docs")).fetchdf()[cols]\
        .sort_values(cols).reset_index(drop=True).astype(g.dtypes.to_dict())
    assert g.equals(want), g.compare(want) if len(g) == len(want) \
        else (len(g), len(want))

    by_pair = {r.pair: r for r in got.itertuples()}
    # the planted collocation is present with the exact adjacency count
    assert by_pair["zig zag"].n_ab == 20
    # perfectly-bound pair beats the frequent-but-promiscuous pair
    assert by_pair["zig zag"].lr_q10 > by_pair["red green"].lr_q10
    # "zag red": zag also precedes red → lower ratio than the pure pair
    assert by_pair["zig zag"].lr_q10 >= max(r.lr_q10 for r in got.itertuples())


def test_min_pair_cut(frames):
    df, _ = frames
    got = C.pmi_collocations(df).toPandas()
    assert (got.n_ab >= C.MIN_PAIR).all()
    assert len(got) <= C.TOPK
