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


def test_label_prop_matches_duckdb(spark, duck):
    a = (L.host_label_propagation(_docs(spark)).toPandas()
         .sort_values("host").reset_index(drop=True))
    b = (duck.execute(L.host_label_propagation_sql(
            f"read_parquet('{SF_TEST}/documents.parquet')")).fetchdf()
         .sort_values("host").reset_index(drop=True))
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        an, bn = np.asarray([v is None or v != v for v in av]), \
            np.asarray([v is None or v != v for v in bv])
        assert np.array_equal(an, bn), c
        if c == "host":
            assert np.array_equal(av, bv), c
        else:
            assert np.array_equal(av[~an].astype("int64"),
                                  bv[~bn].astype("int64")), c


def test_label_prop_invariants(spark):
    out = L.host_label_propagation(_docs(spark)).toPandas()
    # seeds exist and always hold their fixed label
    seeds = out[out["is_seed"] == 1]
    assert len(seeds) > 0
    assert (seeds["label"] == seeds["seed_label"]).all()
    # every assigned label is one of the N_LABELS classes
    lab = out["label"].dropna()
    assert set(lab.astype("int64").unique()) <= set(range(L.N_LABELS))
    # propagation reached beyond the seed set
    assert (out[out["is_seed"] == 0]["label"].notna()).sum() > 0


def test_label_prop_zero_rounds_is_seeds_only(spark):
    out = L.host_label_propagation(_docs(spark), n_iter=0).toPandas()
    assert (out[out["is_seed"] == 0]["label"].isna()).all()
    s = out[out["is_seed"] == 1]
    assert (s["label"] == s["seed_label"]).all()
