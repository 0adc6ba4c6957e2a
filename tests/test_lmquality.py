"""Char-bigram LM perplexity-proxy filter: engine/oracle parity and the
score's discriminative behavior on planted gibberish."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import lmquality

NATURAL = ("the quick brown fox jumps over the lazy dog and then the dog "
           "sleeps near the warm fire while the fox runs back to the den")
DOCS = [
    # train slice = doc_id % 3 == 0 -> ids 0, 3, 6 (natural text only)
    (0, NATURAL),
    (3, "the dog and the fox are friends near the warm den and the fire"),
    (6, "a lazy dog sleeps while the quick fox jumps over logs and runs"),
    # scored docs
    (1, "the dog jumps over the fox near the fire"),       # in-distribution
    (2, "zxqj vwkp qqzz xjvw kpzx wqjz pxvk zzqw"),        # gibberish
    (4, "the dog éé üü unseen chars"),  # OOV codepoints
    (5, "ab"),                                             # single bigram
    (7, "x"),                                              # no bigram: drop
    (8, None),                                             # NULL text: drop
]


@pytest.fixture(scope="module")
def lm_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict()
            for r in lmquality.lm_quality_scores(df).collect()}


def test_matches_oracle(spark, lm_rows):
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", DOCS)
    want = con.execute(lmquality.lm_quality_sql(doc_rel="docs")).fetchall()
    assert len(want) == len(lm_rows)
    for doc_id, n_bg, total, mean, keep in want:
        g = lm_rows[doc_id]
        assert (g["n_bigrams"], g["total_bits"], g["mean_bits"],
                g["keep"]) == (n_bg, total, mean, keep), doc_id


def test_no_bigram_and_null_docs_dropped(lm_rows):
    assert 7 not in lm_rows and 8 not in lm_rows


@pytest.fixture(scope="module")
def oov_penalty(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    lm = lmquality.train_bigram_lm(df)
    from pyspark.sql import functions as F
    return (lm.agg(F.max("bits")).collect()[0][0]
            + lmquality.OOV_MARGIN_BITS)


def test_gibberish_scores_worse(lm_rows, oov_penalty):
    assert lm_rows[2]["mean_bits"] > lm_rows[1]["mean_bits"] + 3
    # nearly every gibberish bigram is OOV (only the space-adjacent ones
    # like ' q' exist in train) -> mean approaches the derived penalty,
    # and no doc can exceed it
    assert lm_rows[2]["mean_bits"] > oov_penalty - 4
    assert all(r["mean_bits"] <= oov_penalty for r in lm_rows.values())


def test_oov_chars_raise_score(lm_rows):
    assert lm_rows[4]["mean_bits"] > lm_rows[1]["mean_bits"]


def test_train_docs_score_low(lm_rows, oov_penalty):
    # training docs are in-distribution by construction
    for d in (0, 3, 6):
        assert lm_rows[d]["mean_bits"] < oov_penalty - 2
