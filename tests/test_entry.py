"""Fast local version of the driver's correctness gate (sf0.001)."""

from __future__ import annotations

import numpy as np
import pytest

import __spark_entry__ as E

from conftest import SF_SMOKE


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"zone_id", "tile_id", "n_pages"} <= set(df.columns)


def test_queries_have_oracles():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)


@pytest.mark.parametrize("name",
                         sorted(set(E.queries()) - set(E.oracle_sql())))
def test_non_oracle_queries_run(spark, name):
    """Rows-only queries (no SQL oracle) must still execute and yield rows
    with a stable schema — the driver's weaker check.

    NOTE: every query currently HAS an oracle, so the parameter set is
    empty and pytest reports this as the suite's single intentional SKIP
    ("got empty parameter set"). The test stays: it self-arms the moment a
    rows-only query is ever added."""
    df = E.queries()[name](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_query_matches_duckdb_oracle(spark, duck, name):
    sdf = E.queries()[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(E.oracle_sql()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    for c in cols:
        if a[c].dtype == object:
            assert (a[c].values == b[c].values).all(), c
        else:
            av = a[c].to_numpy(dtype="float64", na_value=np.nan)
            bv = b[c].to_numpy(dtype="float64", na_value=np.nan)
            assert np.array_equal(av, bv, equal_nan=True), c
