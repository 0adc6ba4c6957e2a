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

import numpy as np
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
