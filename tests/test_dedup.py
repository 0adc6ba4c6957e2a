"""Dedup family vs DuckDB oracles (bit-exact, order-insensitive)."""

from __future__ import annotations

import pandas as pd
import pytest

from geoclimate_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _cmp(spark_df, duck, sql, sort_cols):
    got = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    exp = duck.sql(sql).df().sort_values(sort_cols).reset_index(drop=True)
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    return got


def test_exact_duplicates(spark, duck):
    got = _cmp(dedup.exact_duplicates(_docs(spark)), duck,
               dedup.exact_duplicates_sql(), ["id"])
    assert len(got) == _docs(spark).count()
    assert (got.canon_id <= got.id).all()


def test_ngram_jaccard(spark, duck):
    got = _cmp(dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.7), duck,
               dedup.ngram_jaccard_sql(threshold=0.7), ["id_a", "id_b"])
    assert (got.jaccard >= 0.7).all()
    assert (got.id_a < got.id_b).all()


def test_ngram_jaccard_max_df(spark, duck):
    _cmp(dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.5, max_df=20), duck,
         dedup.ngram_jaccard_sql(threshold=0.5, max_df=20), ["id_a", "id_b"])


def test_minhash_signature_parity(spark, duck):
    """Signatures themselves (not just pairs) match the oracle bit-for-bit."""
    sig = dedup.minhash_signatures(_docs(spark), n_hashes=4)
    sql = (f"WITH {dedup.shingle_cte_sql()},\n{dedup.minhash_sig_cte_sql(4)}"
           "\nSELECT * FROM sig")
    _cmp(sig, duck, sql, ["id"])


def test_minhash_lsh(spark, duck):
    got = _cmp(dedup.minhash_near_duplicates(_docs(spark), threshold=0.8), duck,
               dedup.minhash_lsh_sql(threshold=0.8), ["id_a", "id_b"])
    # LSH recall sanity: every surviving pair is a true near-dup
    assert (got.jaccard >= 0.8).all()


def test_minhash_recall_vs_bruteforce(spark):
    """On the planted near-dups (jaccard>=0.9) LSH recall should be high."""
    brute = dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.9).toPandas()
    lsh = dedup.minhash_near_duplicates(_docs(spark), threshold=0.9).toPandas()
    if len(brute):
        bp = set(zip(brute.id_a, brute.id_b))
        lp = set(zip(lsh.id_a, lsh.id_b))
        assert lp <= bp
        assert len(lp) / len(bp) >= 0.8


def test_simhash(spark, duck):
    got = _cmp(dedup.simhash_near_duplicates(_docs(spark), max_hamming=6), duck,
               dedup.simhash_sql(max_hamming=6), ["id_a", "id_b"])
    assert (got.hamming <= 6).all()
