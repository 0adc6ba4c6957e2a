"""Tile assignment + multiscale LOD rollups.

Reference analogues: rect grid creation + (id_row, id_col) ids
(`/root/reference/geoindicators/.../SpatialUnits.groovy:561-625`), the
largest-overlap top-1 assignment rule (`SpatialUnits.groovy:517-529` —
``ORDER BY ST_AREA(ST_INTERSECTION(..)) DESC LIMIT 1``) and LOD
re-aggregation `ID_ROW_LOD_i = (ABS(ID_ROW-1)/3^i)+1`
(`GridIndicators.groovy:142-165`).

Here a tile IS a grid cell at TILE_RES, so point→tile assignment is pure
integer column arithmetic (codegen'd, zero UDF, zero shuffle) and LOD rollup
is a bit-shift parent + re-aggregate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import geometry, grid
from ..sources.layers import Zone

TILE_RES = 7  # ~1.4° tiles globally; override per pipeline


def tile_col(lon_e6: Column, lat_e6: Column, res: int = TILE_RES) -> Column:
    return grid.cell_col(lon_e6, lat_e6, res)


def tile_sql(lon_e6_sql: str, lat_e6_sql: str, res: int = TILE_RES) -> str:
    return grid.cell_sql(lon_e6_sql, lat_e6_sql, res)


def with_tile(df: DataFrame, lon: str = "lon_e6", lat: str = "lat_e6",
              res: int = TILE_RES, out: str = "tile_id") -> DataFrame:
    return df.withColumn(out, tile_col(F.col(lon), F.col(lat), res))


def lod_rollup(df: DataFrame, cell_col_name: str, child_res: int, levels: int,
               aggs: list[Column]) -> dict[int, DataFrame]:
    """Re-aggregate a cell-keyed table at successively coarser resolutions.

    Returns {res: DataFrame(cell, *aggs)}. Parent derivation is a bit shift —
    exact containment, so rollups are loss-free re-aggregations (unlike H3's
    approximate child nesting). Aggs must be algebraic (sum/count/min/max) for
    map-side partial aggregation.
    """
    out = {}
    for i in range(1, levels + 1):
        pres = child_res - i
        parent = grid.parent_col(F.col(cell_col_name), pres, child_res).alias("cell")
        out[pres] = df.groupBy(parent).agg(*aggs)
    return out


def largest_overlap_tile(spark, zones_df: DataFrame, res: int = TILE_RES) -> DataFrame:
    """DISTRIBUTED spatialJoin mode B (largest-overlap top-1,
    `SpatialUnits.groovy:517-529` ``ORDER BY ST_AREA(ST_INTERSECTION(..))
    DESC LIMIT 1``): each zone rect is assigned the grid tile it overlaps
    most, tie-break lowest packed tile id. Exact bigint µ°² overlaps →
    bit-identical to the SQL oracle.

    ``zones_df``: (zone_id, zlon0, zlat0, zlon1, zlat1) integer µ° bounds
    (operators/raster.py::zone_bounds_df). Candidate generation is a
    broadcast crossJoin against the res-grid (small-dim case); at planetary
    zone counts swap in the bbox covering index of spatial_join.py.
    Returns (zone_id, tile_id, overlap_e6sq).
    """
    from pyspark.sql import Window

    from .raster import grid_cells_df
    cells = grid_cells_df(spark, res)
    z, c = F.broadcast(zones_df).alias("z"), cells.alias("c")
    ox = F.least(F.col("c.lon1_e6"), F.col("z.zlon1")) - F.greatest(F.col("c.lon0_e6"), F.col("z.zlon0"))
    oy = F.least(F.col("c.lat1_e6"), F.col("z.zlat1")) - F.greatest(F.col("c.lat0_e6"), F.col("z.zlat0"))
    packed = (F.lit(res).cast("long") * F.lit(1 << 58)
              + F.col("c.x") * F.lit(1 << 29) + F.col("c.y")).cast("long")
    j = (c.crossJoin(z)
         .withColumn("_w", F.when((ox > 0) & (oy > 0), ox * oy).otherwise(F.lit(0)))
         .where(F.col("_w") > 0)
         .select("zone_id", packed.alias("tile_id"), F.col("_w").alias("overlap_e6sq")))
    win = Window.partitionBy("zone_id").orderBy(F.col("overlap_e6sq").desc(),
                                                F.col("tile_id").asc())
    return (j.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1).drop("_rn"))


def largest_overlap_tile_sql(zones_values_sql: str, res: int = TILE_RES) -> str:
    """DuckDB mirror of :func:`largest_overlap_tile`."""
    from .raster import _check_res
    nx, ny, w = _check_res(res)
    return f"""WITH cells AS (
  SELECT i AS cell_id, i % {nx} AS x, CAST((i - i % {nx}) / {nx} AS BIGINT) AS y
  FROM generate_series(0, {nx * ny - 1}) g(i)),
cb AS (SELECT cell_id, x, y,
       x * {w} - 180000000 AS lon0_e6, y * {w} - 90000000 AS lat0_e6,
       (x + 1) * {w} - 180000000 AS lon1_e6, (y + 1) * {w} - 90000000 AS lat1_e6
  FROM cells),
zones AS ({zones_values_sql}),
j AS (SELECT z.zone_id,
        CAST({res} AS BIGINT) * {1 << 58} + c.x * {1 << 29} + c.y AS tile_id,
        (LEAST(c.lon1_e6, z.zlon1) - GREATEST(c.lon0_e6, z.zlon0))
      * (LEAST(c.lat1_e6, z.zlat1) - GREATEST(c.lat0_e6, z.zlat0)) AS overlap_e6sq
  FROM cb c, zones z
  WHERE LEAST(c.lon1_e6, z.zlon1) > GREATEST(c.lon0_e6, z.zlon0)
    AND LEAST(c.lat1_e6, z.zlat1) > GREATEST(c.lat0_e6, z.zlat0)),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY zone_id
           ORDER BY overlap_e6sq DESC, tile_id ASC) AS rn FROM j)
SELECT zone_id, tile_id, overlap_e6sq FROM ranked WHERE rn = 1"""


def assign_tiles_polygons(zones: list[Zone], res: int = TILE_RES) -> pd.DataFrame:
    """Largest-overlap top-1 tile per polygon (driver-side; zones are a small
    dim). Overlap area via Sutherland–Hodgman clip vs the tile rect; ties
    break to the lowest tile id (reference `SpatialUnits.groovy:526-528`
    ORDER BY area DESC LIMIT 1 + deterministic id tie-break).
    """
    rows = []
    for z in zones:
        cand = grid.cover_bbox_np(*z.bbox, res)
        lo0, la0, lo1, la1 = grid.cell_bounds_np(cand)
        best_tile, best_area = -1, -1.0
        for c, a0, b0, a1, b1 in sorted(zip(cand.tolist(), lo0, la0, lo1, la1)):
            area = geometry.clip_area_rect(z.poly, a0, b0, a1, b1)
            if area > best_area + 1e-12:
                best_tile, best_area = int(c), float(area)
        rows.append({"zone_id": z.zone_id, "tile_id": best_tile, "overlap_area": best_area})
    return pd.DataFrame(rows)
