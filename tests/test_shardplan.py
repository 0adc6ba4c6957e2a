"""Export shard plan: decomposed-rank parity + balance bound."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import shardplan as SP

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
    got = SP.export_shard_plan(df).toPandas()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(SP.export_shard_plan_sql()).fetchdf()[cols]\
        .sort_values(cols).reset_index(drop=True).astype(got.dtypes.to_dict())
    assert got.equals(want), got.compare(want) if len(got) == len(want) \
        else (len(got), len(want))


def test_balance_bound(frames):
    """Sorted round-robin: shard char totals spread ≤ the largest doc."""
    df, _ = frames
    got = SP.export_shard_plan(df).toPandas()
    totals = got.groupby("shard").n_chars.sum()
    assert len(totals) == SP.N_SHARDS
    assert totals.max() - totals.min() <= got.n_chars.max()
    # ranks are a permutation of 1..n
    assert sorted(got["rank"]) == list(range(1, len(got) + 1))
