"""Histogram quantile sketch: parity, one-bin error bound, mergeability."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import sketch as S

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"create view documents as select * "
                f"from '{SF}/documents.parquet'")
    return df, con


def test_parity(frames):
    df, con = frames
    got = S.histogram_quantiles(df, "lang", "n_chars").toPandas()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(S.histogram_quantiles_sql(
        "SELECT * FROM documents", "lang", "n_chars")).fetchdf()[cols]\
        .sort_values(cols).reset_index(drop=True).astype(got.dtypes.to_dict())
    assert got.equals(want), got.compare(want) if len(got) == len(want) \
        else (len(got), len(want))


def test_error_bound_vs_exact(frames):
    """|sketch − exact rank-quantile| < bin width, for every (lang, pct)."""
    df, con = frames
    got = {(r.lang, r.pct): r.est
           for r in S.histogram_quantiles(df, "lang", "n_chars").collect()}
    vals = con.execute(
        "SELECT lang, n_chars FROM documents ORDER BY lang, n_chars")\
        .fetchdf()
    for lang, g in vals.groupby("lang"):
        xs = g.n_chars.tolist()
        for pct in S.HIST_PCTS:
            r = max((pct * len(xs) + 99) // 100, 1)
            v = xs[r - 1]
            assert abs(got[(lang, pct)] - v) < S.HIST_BIN_W, (
                lang, pct, got[(lang, pct)], v)


def test_merge_equivalence(frames):
    """Sketching two halves and merging == sketching the whole (the
    histogram is a sum of counts; Spark's partial agg IS the merge —
    asserted by comparing arbitrary disjoint splits)."""
    df, _ = frames
    whole = {(r.lang, r.pct): (r.n, r.est)
             for r in S.histogram_quantiles(df, "lang", "n_chars").collect()}
    # union of disjoint halves re-aggregates through the same groupBy
    halves = df.where("doc_id % 2 = 0").unionByName(
        df.where("doc_id % 2 = 1"))
    merged = {(r.lang, r.pct): (r.n, r.est)
              for r in S.histogram_quantiles(halves, "lang",
                                             "n_chars").collect()}
    assert whole == merged


def test_exact_mad(spark):
    """MAD vs numpy on odd/even group sizes + outlier robustness."""
    import numpy as np
    import duckdb
    from geoclimate_spark.operators import zonal as Z
    rows = ([("a", v) for v in [1, 2, 3, 4, 100]]        # outlier group
            + [("b", v) for v in [10, 20, 30, 40]]        # even size
            + [("c", v) for v in [7]])                    # singleton
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    got = {r.lang: r for r in Z.exact_mad(df, "lang", "n_chars").collect()}
    for g in ("a", "b", "c"):
        vals = np.array([v for k, v in rows if k == g], dtype=float)
        med = np.percentile(vals, 50, method="linear")
        mad = np.percentile(np.abs(vals - med), 50, method="linear")
        assert got[g].median == med, g
        assert got[g].mad == mad, g
    # robustness: group a's MAD ignores the 100 outlier (std would not)
    assert got["a"].mad <= 2.0
    # parity
    con = duckdb.connect()
    con.execute("create table r (lang varchar, n_chars bigint)")
    con.executemany("insert into r values (?, ?)", rows)
    want = con.execute(Z.exact_mad_sql("SELECT * FROM r", "lang",
                                       "n_chars")).fetchdf()
    for w in want.itertuples():
        r = got[w.lang]
        assert (r.n_rows, r.median, r.mad) == (w.n_rows, w.median, w.mad)
