"""Inverse-cluster-size training weights: parity + budget invariants."""

from __future__ import annotations

import numpy as np

from conftest import SF_TEST

from geoclimate_spark.operators import dupweight as W


def _docs(spark):
    return spark.read.parquet(f"{SF_TEST}/documents.parquet")


def test_dup_weighted_budget_matches_duckdb(spark, duck):
    a = (W.dup_weighted_budget(_docs(spark), threshold=0.8).toPandas()
         .sort_values("lang").reset_index(drop=True))
    b = (duck.execute(W.dup_weighted_budget_sql(
            0.8, f"read_parquet('{SF_TEST}/documents.parquet')")).fetchdf()
         .sort_values("lang").reset_index(drop=True))
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert np.array_equal(a[c].values, b[c].values), c


def test_dup_weighted_budget_invariants(spark):
    out = W.dup_weighted_budget(_docs(spark), threshold=0.8).toPandas()
    docs = _docs(spark).toPandas()
    # weighting only shrinks the budget, never grows it
    assert (out["eff_chars"] <= out["raw_chars"]).all()
    assert (out["eff_chars"] >= 0).all()
    # clusters partition docs within a language slice
    assert (out["n_clusters"] <= out["n_docs"]).all()
    # every doc is covered exactly once: per-lang doc counts match the dim
    got = out.set_index("lang")["n_docs"].to_dict()
    want = docs.groupby("lang")["doc_id"].count().to_dict()
    assert got == {k: int(v) for k, v in want.items()}
    # raw budget is conserved: sum matches the dim's n_chars total
    assert out["raw_chars"].sum() == int(docs["n_chars"].sum())


def test_singleton_cluster_keeps_full_weight(spark):
    # a doc in a size-1 component contributes all of its chars
    out = W.dup_weighted_budget(_docs(spark), threshold=0.8)
    docs = _docs(spark)
    from geoclimate_spark.operators.dedup import near_dup_clusters

    cc = near_dup_clusters(docs, 0.8).toPandas()
    if (cc["component_size"] == 1).all():
        pdf = out.toPandas()
        assert (pdf["eff_chars"] == pdf["raw_chars"]).all()
