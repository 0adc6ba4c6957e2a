"""n-gram language-ID: engine/oracle parity + classifier invariants."""

from __future__ import annotations

from conftest import SF_TEST

from geoclimate_spark.operators import langid


def _docs(spark):
    return spark.read.parquet(f"{SF_TEST}/documents.parquet")


def test_confusion_matches_duckdb(spark, duck):
    import numpy as np

    a = (langid.lang_confusion(_docs(spark)).toPandas()
         .sort_values(["lang_true", "lang_pred"]).reset_index(drop=True))
    sql = langid.lang_confusion_sql(
        f"read_parquet('{SF_TEST}/documents.parquet')")
    b = (duck.execute(sql).fetchdf()
         .sort_values(["lang_true", "lang_pred"]).reset_index(drop=True))
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert np.array_equal(a[c].values, b[c].values), c


def test_every_doc_classified(spark):
    docs = _docs(spark)
    n_docs = docs.where("text IS NOT NULL").count()
    conf = langid.lang_confusion(docs).toPandas()
    assert conf["n_docs"].sum() == n_docs


def test_profiles_shape_and_weights(spark):
    p = langid.lang_profiles(_docs(spark)).toPandas()
    # at most n_top rows per language; weights are a permutation prefix
    for lang, g in p.groupby("lang"):
        assert len(g) <= langid.N_TOP
        ws = sorted(g["weight"], reverse=True)
        assert ws == list(range(langid.N_TOP, langid.N_TOP - len(ws), -1))


def test_short_and_empty_docs(spark):
    """< 2-char docs produce no bigrams (Spark sequence(1,0) guard) and
    land on 'und' with score 0."""
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog", "en"),
         (1, "a", "en"), (2, "", "de"), (3, None, "fr"),
         (4, "the quick brown fox", "en")],
        "doc_id long, text string, lang string")
    out = {r["doc_id"]: (r["lang_pred"], r["score"])
           for r in langid.classify_language(df).collect()}
    assert out[1] == ("und", 0)   # 1 char → no bigrams
    assert out[2] == ("und", 0)   # empty → no bigrams
    assert 3 not in out           # NULL text is filtered
    # doc 0 trains (0 % 3 == 0) the 'en' profile; doc 4 shares its bigrams
    assert out[0] == ("en", out[0][1]) and out[0][1] > 0
    assert out[4] == ("en", out[4][1]) and out[4][1] > 0
