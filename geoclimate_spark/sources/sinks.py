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


def save_to_catalog(tables: dict[str, DataFrame], database: str,
                    location: str | Path | None = None,
                    bucket_by: dict[str, tuple[int, list[str]]] | None = None,
                    ) -> dict[str, str]:
    """Catalog/DB export — the `WorkflowOSM.groovy:988,1213` batched DB-sink
    analogue (reference exports result tables into a named PostGIS/H2GIS
    database; the Spark-native equivalent is the session catalog, backed by
    Hive metastore / Iceberg REST on a real cluster, spark-warehouse here).

    Each DataFrame becomes ``database.name`` via an atomic snapshot
    overwrite (``saveAsTable`` mode=overwrite). ``bucket_by[name] =
    (n_buckets, cols)`` writes that table BUCKETED — downstream equi-joins
    and aggregations on the bucket columns read co-located data and skip
    the shuffle entirely (the scale lever file sinks can't offer; only the
    catalog records bucketing metadata). Returns {name: qualified_name}.
    """
    if not tables:
        return {}
    spark = next(iter(tables.values())).sparkSession
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
    out = {}
    for name, df in tables.items():
        qual = f"{database}.{name}"
        w = df.write.mode("overwrite").format("parquet")
        if bucket_by and name in bucket_by:
            n, cols = bucket_by[name]
            w = w.bucketBy(n, *cols).sortBy(*cols)
        w.saveAsTable(qual)
        out[name] = qual
    return out


def load_from_catalog(spark, database: str, name: str) -> DataFrame:
    """Read-back of a catalog snapshot (time-travel read under Iceberg)."""
    return spark.table(f"{database}.{name}")
