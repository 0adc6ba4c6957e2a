"""File sinks — the `DataUtils.saveTablesAsFiles` analogue.

Reference: spatial tables → `.fgb`, others → `.csv`
(`/root/reference/geoindicators/.../DataUtils.groovy:101-131`), plus the
batched DB export (`osm/.../WorkflowOSM.groovy:988,1213`). Here every table
is a DataFrame; "spatial" ones carry integer µ° coordinate columns, and the
export formats are parquet (the fgb/db analogue — snapshot-friendly,
predicate-pushdown-able) and csv/json for interchange.

At scale: parquet with explicit partition columns (e.g. tile prefix) so
downstream scans partition-prune; csv/json only for small result tables —
the writer refuses accidental wide-table csv exports above a row budget.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

CSV_ROW_BUDGET = 10_000_000


def save_tables(tables: dict[str, DataFrame], out_dir: str | Path,
                fmt: str = "parquet", partition_by: list[str] | None = None,
                csv_row_budget: int = CSV_ROW_BUDGET) -> dict[str, str]:
    """Write each named DataFrame under ``out_dir/<name>``; returns
    {name: path}. csv/json enforce the row budget (driver-side count) to
    keep interchange formats for small results only."""
    out = Path(out_dir)
    paths = {}
    for name, df in tables.items():
        p = out / name
        w = df.write.mode("overwrite")
        if fmt == "parquet":
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(str(p))
        elif fmt in ("csv", "json"):
            n = df.count()
            if n > csv_row_budget:
                raise ValueError(
                    f"{name}: {n} rows exceeds the {fmt} export budget "
                    f"({csv_row_budget}) — use parquet for large tables")
            if fmt == "csv":
                w.option("header", "true").csv(str(p))
            else:
                w.json(str(p))
        else:
            raise ValueError(f"unsupported format: {fmt}")
        paths[name] = str(p)
    return paths
