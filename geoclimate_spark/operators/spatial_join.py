"""Point-in-polygon spatial join: pages × zone polygons.

THE core operator (north rule). Reference semantics: `spatialJoin` mode A —
each source row gets the id of the zone containing its point
(`/root/reference/geoindicators/.../SpatialUnits.groovy:510-515`,
``ST_POINTONSURFACE(a) && b AND ST_INTERSECTS``), boundary-inclusive, with
deterministic lowest-id tie-break at shared boundaries (convention of
`RsuIndicators.groovy:955-957`).

Spark-first physical strategy (filter-and-refine, SURVEY.md §4):

1. zones (small dim, driver-side) are exploded into a covering of grid cells
   at an auto-picked resolution, each flagged *full* (cell entirely inside the
   zone) or *partial* — the ST_SUBDIVIDE + spatial-index analogue;
2. the page side derives its cell key with pure column arithmetic (codegen'd,
   no UDF) and **broadcast hash joins** the covering — no shuffle of the big
   side, filters/pruning push into the parquet scan;
3. only rows landing in *partial* cells run the exact vectorized
   ray-cast refine (Arrow-batched pandas UDF over the broadcast zone dim) —
   at a sane covering resolution that's the boundary sliver, a few % of rows;
4. the winning zone per page is ``min(zone_id)`` — a partial-aggregable
   (map-side combine) commutative agg, so the only shuffle in the operator is
   (key, zone_id) pairs, never the wide page rows.

At 100 TB: step 2's broadcast is a few MB of (cell → zone) pairs even for
10^5 zones; skew from dense urban cells is irrelevant to the join itself
(broadcast, no key shuffle) and handled at aggregation time by AQE +
salted two-phase aggs (see operators/zonal.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geometry, grid
from ..sources.layers import Zone, zone_covering


def pick_cover_res(zones: list[Zone], max_cells: int = 20_000) -> int:
    """Finest resolution whose total bbox covering stays under max_cells."""
    best = 0
    for res in range(0, grid.MAX_RES + 1):
        w = grid.cell_width_deg(res)
        total = 0
        for z in zones:
            lo0, la0, lo1, la1 = z.bbox
            total += (int((lo1 - lo0) / w) + 2) * (int((la1 - la0) / (w / 2) / 2) + 2)
        if total > max_cells:
            return best
        best = res
    return best


def covering_df(spark, zones: list[Zone], res: int) -> DataFrame:
    cell, zid, full = zone_covering(zones, res)
    pdf = pd.DataFrame({"z_cell": cell, "zone_id": zid, "z_full": full})
    return spark.createDataFrame(pdf)


def _pip_refine_udf(zones: list[Zone]):
    """(lon_e6, lat_e6, zone_id) -> bool, vectorized per zone within a batch.

    The zones list rides the UDF closure → serialized once per task via the
    broadcast-like closure mechanism (small dim).
    """
    polys = {z.zone_id: z.poly for z in zones}

    @F.pandas_udf(T.BooleanType())
    def pip(lon_e6: pd.Series, lat_e6: pd.Series, zone_id: pd.Series) -> pd.Series:
        px = lon_e6.to_numpy(np.float64) / grid.LON_SCALE
        py = lat_e6.to_numpy(np.float64) / grid.LON_SCALE
        zid = zone_id.to_numpy(np.int64)
        out = np.zeros(len(px), dtype=bool)
        for z in np.unique(zid):
            m = zid == z
            out[m] = geometry.points_in_polygon(px[m], py[m], polys[int(z)])
        return pd.Series(out)

    return pip


def spatial_join_points(df: DataFrame, zones: list[Zone], key: str = "page_id",
                        lon: str = "lon_e6", lat: str = "lat_e6",
                        res: int | None = None, max_cells: int = 20_000,
                        passthrough: list[str] | None = None) -> DataFrame:
    """Assign each row's point to its containing zone.

    Returns ``(key, zone_id, *passthrough)`` — one row per input row whose
    point lies in at least one zone; lowest zone_id wins on boundaries/
    overlaps. ``passthrough`` columns ride through the narrow aggregation
    (every candidate row of a key carries identical values, so ``first`` is
    deterministic) — avoids a second wide join at page scale.
    """
    spark = df.sparkSession
    if res is None:
        res = pick_cover_res(zones, max_cells)
    cov = covering_df(spark, zones, res)
    pip = _pip_refine_udf(zones)
    passthrough = passthrough or []

    pts = (df.where(F.col(lon).isNotNull())
             .select(key, lon, lat, *passthrough)
             .withColumn("_jcell", grid.cell_col(F.col(lon), F.col(lat), res)))
    cand = pts.join(F.broadcast(cov), pts["_jcell"] == cov["z_cell"], "inner")
    hit = cand.where(F.col("z_full") | pip(F.col(lon), F.col(lat), F.col("zone_id")))
    # Passthrough + coords go in the GROUPING KEY, not first() buffers:
    # string agg buffers would force SortAggregate; as keys the plan stays a
    # HashAggregate with map-side combine (values identical per page, so the
    # grouping is still one group per page).
    out = (hit.groupBy(key, lon, lat, *passthrough)
           .agg(F.min("zone_id").alias("zone_id")))
    return out.select(key, "zone_id", lon, lat, *passthrough)


def spatial_join_points_np(lon_e6: np.ndarray, lat_e6: np.ndarray,
                           zones: list[Zone]) -> np.ndarray:
    """Driver-side numpy oracle (test use): containing zone id or -1."""
    px = np.asarray(lon_e6, np.float64) / grid.LON_SCALE
    py = np.asarray(lat_e6, np.float64) / grid.LON_SCALE
    out = np.full(len(px), -1, dtype=np.int64)
    for z in sorted(zones, key=lambda z: -z.zone_id):
        m = geometry.points_in_polygon(px, py, z.poly)
        out[m] = z.zone_id
    return out
