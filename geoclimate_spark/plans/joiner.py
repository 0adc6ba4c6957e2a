"""N-way indicator-table assembler — `joinTables` analogue.

Reference: `GeoIndicatorsDataUtils.joinTables` (`/root/reference/
geoindicators/src/main/groovy/org/orbisgis/geoclimate/geoindicators/
DataUtils.groovy:40-87`): the first table anchors, every further table
LEFT JOINs on its own id column against the anchor's id, duplicate id
columns are dropped, and columns are optionally prefixed with their source
table name.

Spark-first: when every per-zone indicator table shares the zone key, the
joins are same-key equi-joins — co-partitioned if the indicator tables were
produced by groupBy(zone) (they inherit hash partitioning on the key), so
Catalyst plans them without extra exchanges; small dims broadcast
automatically under AQE. The assembler is pure plan construction, no
action.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_tables(tables: Sequence[tuple[str, DataFrame, str]],
                prefix_with_name: bool = False) -> DataFrame:
    """Assemble indicator tables into one wide row per anchor id.

    ``tables``: (name, df, id_col) triples; the FIRST entry anchors and
    keeps all rows (reference semantics: later tables LEFT JOIN on
    ``later.id_col == anchor.id_col``). Non-anchor id columns are dropped;
    with ``prefix_with_name`` every non-id column is renamed
    ``{name}_{col}`` (the reference's prefixWithTabName flag).
    """
    if not tables:
        raise ValueError("join_tables needs at least one table")
    name0, df0, key0 = tables[0]
    if prefix_with_name:
        df0 = df0.select(F.col(key0),
                         *[F.col(c).alias(f"{name0}_{c}")
                           for c in df0.columns if c != key0])
    out = df0
    for name, df, key in tables[1:]:
        cols = [c for c in df.columns if c != key]
        sel = [F.col(key).alias(key0) if key != key0 else F.col(key0)]
        for c in cols:
            sel.append(F.col(c).alias(f"{name}_{c}") if prefix_with_name
                       else F.col(c))
        out = out.join(df.select(*sel), key0, "left")
    return out


def join_tables_sql(tables: Sequence[tuple[str, str, str]]) -> str:
    """DuckDB mirror (unprefixed variant): anchor keeps all columns, later
    relations contribute ``* EXCLUDE (id)`` through LEFT JOINs."""
    _, rel0, key0 = tables[0]
    sel = ["a0.*"]
    joins = []
    for i, (_, rel, key) in enumerate(tables[1:], start=1):
        sel.append(f"a{i}.* EXCLUDE ({key})")
        joins.append(f"LEFT JOIN ({rel}) a{i} ON a{i}.{key} = a0.{key0}")
    return (f"SELECT {', '.join(sel)} FROM ({rel0}) a0 "
            + " ".join(joins))
