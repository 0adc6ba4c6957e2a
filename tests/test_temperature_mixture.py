"""Temperature-scaled mixture: parity, isqrt exactness, budget invariant."""
from __future__ import annotations

import math

import duckdb
import pytest

from geoclimate_spark.operators import mixture as M

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"create view documents as select * "
                f"from '{SF}/documents.parquet'")
    return df, con


def test_parity_and_budget(frames):
    df, con = frames
    got = M.temperature_mixture(df).toPandas()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(M.temperature_mixture_sql()).fetchdf()[cols]\
        .sort_values(cols).reset_index(drop=True).astype(got.dtypes.to_dict())
    assert got.equals(want), got.compare(want) if len(got) == len(want) \
        else (len(got), len(want))
    # exact apportionment: targets sum to the budget exactly
    assert got.target_tokens.sum() == M.TOKEN_BUDGET
    # weight is the exact integer sqrt of the char mass
    for r in got.itertuples():
        assert r.weight == math.isqrt(r.avail_chars)
    # temperature flattening: every slice's budget share exceeds half its
    # weight share floor and tail languages gain vs proportional-by-chars
    tot_chars = got.avail_chars.sum()
    tail = got.loc[got.avail_chars.idxmin()]
    assert tail.target_tokens * tot_chars > tail.avail_chars * M.TOKEN_BUDGET


def test_isqrt_correction_on_perfect_squares(spark):
    """The ±1 correction yields exact isqrt even at perfect squares and
    off-by-one neighbors, where naive floor(sqrt(double)) mis-rounds."""
    vals = []
    for base in (10**6, 10**9, 4 * 10**12, (1 << 26) - 1):
        s = math.isqrt(base)
        vals += [s * s - 1, s * s, s * s + 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    from pyspark.sql import functions as F
    got = df.select("x", F.expr(M._isqrt_sql("x")).alias("s")).collect()
    for r in got:
        assert r.s == math.isqrt(r.x), (r.x, r.s)
    con = duckdb.connect()
    for v in vals:
        (s,) = con.execute(
            f"SELECT {M._isqrt_sql(str(v))}").fetchone()
        assert s == math.isqrt(v), (v, s)
