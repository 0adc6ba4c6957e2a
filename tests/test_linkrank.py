"""Integer fixed-point PageRank: parity, conservation-ish invariants."""

from __future__ import annotations

import numpy as np

from conftest import SF_TEST

from geoclimate_spark.operators import linkrank as L


def _docs(spark):
    return spark.read.parquet(f"{SF_TEST}/documents.parquet")


def test_pagerank_matches_duckdb(spark, duck):
    a = (L.host_pagerank(_docs(spark)).toPandas()
         .sort_values("host").reset_index(drop=True))
    b = (duck.execute(L.host_pagerank_sql(
            f"read_parquet('{SF_TEST}/documents.parquet')")).fetchdf()
         .sort_values("host").reset_index(drop=True))
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert np.array_equal(a[c].values, b[c].values), c


def test_pagerank_invariants(spark):
    out = L.host_pagerank(_docs(spark)).toPandas()
    # every host has a rank; no-in-link hosts sit at the base rank
    assert (out["rank_int"] >= L.BASE).all()
    sinks = out[out["indeg"] == 0]
    assert (sinks["rank_int"] == L.BASE).all()
    # in-linked hosts rise above base
    linked = out[out["indeg"] > 0]
    assert (linked["rank_int"] > L.BASE).all()
    # fixed-point mass stays bounded by the damping geometry
    assert out["rank_int"].max() < len(out) * L.SCALE


def test_zero_iterations_is_uniform(spark):
    out = L.host_pagerank(_docs(spark), n_iter=0).toPandas()
    assert (out["rank_int"] == L.SCALE).all()
