"""tf·icf term salience: engine/oracle parity + ranking invariants."""

from __future__ import annotations

import numpy as np

from conftest import SF_TEST

from geoclimate_spark.operators import salience


def test_top_terms_match_duckdb(spark, duck):
    a = (salience.doc_top_terms(
            spark.read.parquet(f"{SF_TEST}/documents.parquet")).toPandas()
         .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    b = (duck.execute(salience.doc_top_terms_sql(
            f"read_parquet('{SF_TEST}/documents.parquet')")).fetchdf()
         .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert np.array_equal(a[c].values, b[c].values), c


def test_ranking_invariants(spark):
    df = spark.createDataFrame(
        [(1, "rare rare rare common"), (2, "common common other"),
         (3, None), (4, "  ")],
        "doc_id long, text string")
    out = salience.doc_top_terms(df).toPandas()
    assert 3 not in set(out["doc_id"])        # NULL text filtered
    assert 4 not in set(out["doc_id"])        # whitespace-only → no tokens
    d1 = out[out["doc_id"] == 1].sort_values("rank")
    # 'rare' (tf 3, df 1) outranks 'common' (tf 1, df 2)
    assert list(d1["term"]) == ["rare", "common"]
    assert (d1["score"].values == [(3 << 30) // 1, (1 << 30) // 2]).all()
    # ranks are 1..k dense per doc
    for _, g in out.groupby("doc_id"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, len(g) + 1))
