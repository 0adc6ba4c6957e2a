"""Sketch operators: engine/oracle parity + the sketches' own guarantees."""

from __future__ import annotations

import numpy as np

from conftest import SF_TEST

from geoclimate_spark.operators import sketch


def _docs(spark):
    return spark.read.parquet(f"{SF_TEST}/documents.parquet")


DOCS_SQL = ("SELECT doc_id, text, lang, source FROM "
            f"read_parquet('{SF_TEST}/documents.parquet')")


def _pairs(spark_df, duck, sql, key):
    import duckdb  # noqa: F401 — duck fixture owns the connection
    a = spark_df.toPandas().sort_values(key).reset_index(drop=True)
    b = duck.execute(sql).fetchdf().sort_values(key).reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    return a, b[a.columns]


def test_bin_bitlength_parity(spark, duck):
    """length(bin(x)) — the rho primitive — is identical in both engines
    across the suffix range (no zero padding on either side)."""
    vals = [0, 1, 2, 3, 42, (1 << 30) - 1, 1 << 53, (1 << 54) - 1]
    s = spark.sql("SELECT " + ", ".join(
        f"length(bin({v}L)) AS b{i}" for i, v in enumerate(vals))).collect()[0]
    d = duck.execute("SELECT " + ", ".join(
        f"length(bin(CAST({v} AS BIGINT))) AS b{i}"
        for i, v in enumerate(vals))).fetchone()
    assert tuple(s) == tuple(d)
    assert tuple(s) == tuple(max(v.bit_length(), 1) for v in vals)


def test_hll_engine_oracle_and_accuracy(spark, duck):
    a, b = _pairs(sketch.hll_distinct(_docs(spark), "lang", "text"), duck,
                  sketch.hll_distinct_sql(DOCS_SQL, "lang", "text"), "lang")
    assert (a["hll_s_int"].values == b["hll_s_int"].values).all()
    assert np.array_equal(a["hll_est"].values, b["hll_est"].values)
    # HLL raw estimate at m=64 has ~13% stderr; allow 3 sigma
    rel = np.abs(a["hll_est"] / a["n_exact"] - 1.0)
    assert (rel < 0.4).all(), rel


def test_kmv_engine_oracle_and_accuracy(spark, duck):
    a, b = _pairs(sketch.kmv_distinct(_docs(spark), "lang", "text"), duck,
                  sketch.kmv_distinct_sql(DOCS_SQL, "lang", "text"), "lang")
    assert (a["kmv_kth"].values == b["kmv_kth"].values).all()
    assert np.array_equal(a["kmv_est"].values, b["kmv_est"].values)
    full = a[a["kmv_used"] == sketch.KMV_K]
    rel = np.abs(full["kmv_est"] / full["n_exact"] - 1.0)
    assert (rel < 0.75).all(), rel  # k=32 → ~18% stderr, 3-4 sigma head room
    # below-k groups are exact by the small-set rule
    small = a[a["kmv_used"] < sketch.KMV_K]
    assert (small["kmv_est"] == small["n_exact"]).all()


def test_cms_engine_oracle_and_overestimate(spark, duck):
    a, b = _pairs(sketch.cms_heavy_hitters(_docs(spark), "source"), duck,
                  sketch.cms_heavy_hitters_sql(DOCS_SQL, "source"), "source")
    assert (a["n_cms"].values == b["n_cms"].values).all()
    assert (a["n_exact"].values == b["n_exact"].values).all()
    # the count-min guarantee: never an underestimate
    assert (a["n_cms"] >= a["n_exact"]).all()
    # totals conserved: every item hashed into every row
    assert a["n_exact"].sum() == _docs(spark).where("source IS NOT NULL").count()


def test_hll_merge_is_max(spark):
    """Sharding the input and max-merging register tables equals the
    single-pass sketch — the mergeability that makes HLL a map-side
    combine at 100 TB."""
    from pyspark.sql import functions as F
    from geoclimate_spark.functions.hashing import hash60_col

    docs = _docs(spark).where(F.col("text").isNotNull())
    whole = sketch.hll_distinct(docs, "lang", "text").toPandas()
    h = hash60_col(F.col("text"))
    shards = [docs.where(h % 2 == i) for i in (0, 1)]
    # rebuild register tables per shard, union, re-max, refold
    def regs(df):
        src = df.select(F.col("lang"), hash60_col(F.col("text")).alias("_h"))
        return (src.select("lang", (F.col("_h") % sketch.HLL_M).alias("_reg"),
                           F.expr(sketch._rho_case_sql(
                               f"(_h div {sketch.HLL_M})")).alias("_rho")))
    merged = (regs(shards[0]).unionAll(regs(shards[1]))
              .groupBy("lang", "_reg").agg(F.max("_rho").alias("_m"))
              .groupBy("lang")
              .agg(F.count("*").alias("_used"),
                   F.sum(F.expr(sketch._term_case_sql("_m"))).alias("_s")))
    got = {r["lang"]: r["_s"] + (sketch.HLL_M - r["_used"]) * sketch._EMPTY_TERM
           for r in merged.collect()}
    want = dict(zip(whole["lang"], whole["hll_s_int"]))
    assert got == want


def test_selfjoin_size_estimate(spark):
    from geoclimate_spark.operators import sketch as SK
    import duckdb
    # skewed keys: key 0 is hot
    rows = [(i, 0 if i % 3 == 0 else i % 40) for i in range(600)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    r = SK.selfjoin_size_estimate(df, "user_id").collect()[0]
    exact = 0
    from collections import Counter
    c = Counter(k for _, k in rows)
    exact = sum(v * v for v in c.values())
    assert r.exact_join_size == exact
    assert r.n_rows == 600 and r.n_keys == len(c)
    # CMS inner-product guarantee: one-sided overestimate
    assert r.cms_estimate >= r.exact_join_size
    assert r.over_millis >= 0
    # parity
    con = duckdb.connect()
    con.execute("create table ev (event_id bigint, user_id bigint)")
    con.executemany("insert into ev values (?, ?)", rows)
    want = con.execute(SK.selfjoin_size_estimate_sql(
        "SELECT * FROM ev", "user_id")).fetchdf().iloc[0]
    for col in ("n_rows", "n_keys", "exact_join_size", "cms_estimate",
                "over_millis"):
        assert r.asDict()[col] == int(want[col]), col


def test_selfjoin_estimate_empty_input(spark, duck):
    """ADVICE r4: empty input (or all-NULL keys) must report over_millis=0,
    not NULL/div-by-zero — engine and oracle both."""
    from geoclimate_spark.operators import sketch as SK
    df = spark.createDataFrame([], "user_id string")
    r = SK.selfjoin_size_estimate(df, "user_id").collect()[0]
    assert r.over_millis == 0
    duck.execute("create or replace view _sje as "
                 "select CAST(NULL AS VARCHAR) AS user_id where 1=0")
    got = duck.execute(SK.selfjoin_size_estimate_sql(
        "SELECT * FROM _sje", "user_id")).fetchall()[0]
    assert got[-1] == 0
