"""Contamination n-gram hygiene: short-doc guard + oracle parity on a
hand fixture containing documents below the n-gram length."""

from __future__ import annotations

from pyspark.sql import types as T

from geoclimate_spark.operators import contamination as C

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta"),
    (1, "alpha beta gamma delta epsilon omega"),      # shares 5-grams with 0?
    (2, "tiny doc"),                                  # < n tokens: no n-grams
    (3, "one"),                                       # 1 token
    (4, ""),                                          # empty text
    (5, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 0
]

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def test_short_docs_do_not_crash_and_match_oracle(spark, duck):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    got = {(int(r.doc_id), int(r.n_hits))
           for r in C.contamination_hits(docs, bench_quota=2).collect()}

    vals = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    rel = f"(SELECT * FROM (VALUES {vals}) AS v(doc_id, text))"
    sql = C.contamination_hits_sql(doc_rel=rel, bench_quota=2)
    want = {(int(a), int(b)) for a, b in duck.execute(sql).fetchall()}
    assert got == want
