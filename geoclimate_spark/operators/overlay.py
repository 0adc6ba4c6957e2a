"""Per-zone overlay + surface fractions + dissolve — the grouped-geometry
operator family (`smallestCommunGeometry` analogue).

Reference: the hardest geometry ops in GeoClimate are per-zone overlays —
`smallestCommunGeometry` flattens N layers into atom polygons carrying 0/1
per-layer flags via ``ST_POLYGONIZE(ST_UNION(ST_NODE(ST_ACCUM(...))))``
(`/root/reference/geoindicators/.../RsuIndicators.groovy:1356-1593`),
`surfaceFractions` then turns flag combos into priority-resolved exclusive
area fractions (`:1622-1747`), and dissolves merge cluster geometry with
``ST_UNION(ST_ACCUM(...))`` (`SpatialUnits.groovy:436-451`).

Spark-first shape (SURVEY.md §2.4 "hardest geometry op"): ``applyInPandas``
grouped by zone — each group holds ONE zone's candidate layer geometries
(pre-joined, so the shuffle moves only the small layer dim), and the overlay
runs vectorized numpy inside the Arrow batch. Axis-aligned rect layers make
the arrangement exact: atoms are the cells of the sorted-coordinate grid of
all rect edges clipped to the zone, flags are interval-containment tests,
areas are exact bigint µ°² — deterministic regardless of partitioning.

No SQL oracle (the arrangement is not reasonably SQL-expressible — the
reference equally leans on the H2GIS native ST_POLYGONIZE here); correctness
is pytest-verified by invariants (Σ atom areas == zone area) and an
independent Monte-Carlo containment oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

COMBO_SCHEMA = T.StructType([
    T.StructField("zone_id", T.LongType()),
    T.StructField("combo", T.LongType()),      # bitmask over layer order
    T.StructField("area_e6sq", T.LongType()),  # exact µ°² area
    T.StructField("n_atoms", T.LongType()),
])


def overlay_rect_layers(zones: DataFrame, rects: DataFrame,
                        layer_names: list[str]) -> DataFrame:
    """Per-zone exact overlay of axis-aligned rect layers.

    ``zones``: (zone_id, zlon0, zlat0, zlon1, zlat1) integer µ° bounds.
    ``rects``: (layer, lon0, lat0, lon1, lat1) integer µ° rects (any count).
    Returns (zone_id, combo, area_e6sq, n_atoms): for every flag combination
    (bit i of ``combo`` = covered by layer_names[i]), the exact area of the
    zone sub-region with exactly that coverage. combo 0 = covered by none.
    Σ area_e6sq per zone == zone area (invariant, tested).
    """
    layer_idx = {n: i for i, n in enumerate(layer_names)}
    z, r = zones.alias("z"), F.broadcast(rects).alias("r")
    # candidate join: rect overlaps zone (layers are the small side)
    cand = (z.join(r, (F.col("r.lon0") < F.col("z.zlon1"))
                   & (F.col("r.lon1") > F.col("z.zlon0"))
                   & (F.col("r.lat0") < F.col("z.zlat1"))
                   & (F.col("r.lat1") > F.col("z.zlat0")), "left")
            .select("zone_id", "zlon0", "zlat0", "zlon1", "zlat1",
                    "layer", "lon0", "lat0", "lon1", "lat1"))

    def run(groups: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for g in groups:
            zid = int(g["zone_id"].iloc[0])
            zx0, zy0 = int(g["zlon0"].iloc[0]), int(g["zlat0"].iloc[0])
            zx1, zy1 = int(g["zlon1"].iloc[0]), int(g["zlat1"].iloc[0])
            rr = g.dropna(subset=["layer"])
            if len(rr):
                rx0 = np.maximum(rr["lon0"].to_numpy(np.int64), zx0)
                ry0 = np.maximum(rr["lat0"].to_numpy(np.int64), zy0)
                rx1 = np.minimum(rr["lon1"].to_numpy(np.int64), zx1)
                ry1 = np.minimum(rr["lat1"].to_numpy(np.int64), zy1)
                bits = np.array([1 << layer_idx[l] for l in rr["layer"]],
                                dtype=np.int64)
            else:
                rx0 = ry0 = rx1 = ry1 = np.empty(0, np.int64)
                bits = np.empty(0, np.int64)
            xs = np.unique(np.concatenate([[zx0, zx1], rx0, rx1]))
            ys = np.unique(np.concatenate([[zy0, zy1], ry0, ry1]))
            xs = xs[(xs >= zx0) & (xs <= zx1)]
            ys = ys[(ys >= zy0) & (ys <= zy1)]
            # atom grid: cell (i,j) spans xs[i]..xs[i+1] × ys[j]..ys[j+1]
            w = np.diff(xs)[:, None]            # (nx-1, 1)
            h = np.diff(ys)[None, :]            # (1, ny-1)
            area = w * h                        # exact int64 products
            cx = xs[:-1][:, None]               # left edge as containment probe
            cy = ys[:-1][None, :]
            combo = np.zeros(area.shape, dtype=np.int64)
            for k in range(len(bits)):
                # atom ⊆ rect iff its lower-left corner is in [r0, r1)
                inside = ((cx >= rx0[k]) & (cx < rx1[k])
                          & (cy >= ry0[k]) & (cy < ry1[k]))
                combo |= np.where(inside, bits[k], 0)
            flat_c = combo.ravel()
            flat_a = area.ravel()
            keep = flat_a > 0
            df = pd.DataFrame({"combo": flat_c[keep], "area_e6sq": flat_a[keep]})
            out = (df.groupby("combo", as_index=False)
                   .agg(area_e6sq=("area_e6sq", "sum"),
                        n_atoms=("area_e6sq", "size")))
            out.insert(0, "zone_id", zid)
            yield out

    return cand.groupBy("zone_id").applyInPandas(run, COMBO_SCHEMA)


def surface_fractions(combos: DataFrame, zones: DataFrame,
                      layer_names: list[str],
                      priority: list[str]) -> DataFrame:
    """Priority-resolved exclusive fractions per zone
    (`RsuIndicators.surfaceFractions`, `:1622-1747`): each combo's area is
    attributed to its highest-priority layer; uncovered area is
    ``undefined_fraction`` (the reference's ``1 - Σ`` rule)."""
    attr = F.lit(None).cast("string")
    for name in reversed(priority):
        bit = 1 << layer_names.index(name)
        attr = F.when(F.col("combo").bitwiseAND(F.lit(bit)) != 0,
                      F.lit(name)).otherwise(attr)
    per = (combos.withColumn("_attr", F.coalesce(attr, F.lit("undefined")))
           .groupBy("zone_id").pivot("_attr", priority + ["undefined"])
           .agg(F.sum("area_e6sq")))
    zarea = ((F.col("zlon1") - F.col("zlon0"))
             * (F.col("zlat1") - F.col("zlat0"))).alias("_za")
    j = zones.select("zone_id", zarea).join(per, "zone_id", "left")
    return j.select(
        "zone_id",
        *[(F.coalesce(F.col(f"`{n}`"), F.lit(0)).cast("double")
           / F.col("_za").cast("double")).alias(f"frac_{n}")
          for n in priority + ["undefined"]])


HULL_SCHEMA = T.StructType([
    T.StructField("component", T.LongType()),
    T.StructField("n_points", T.LongType()),
    T.StructField("hull_area", T.DoubleType()),
    T.StructField("lon_min", T.LongType()),
    T.StructField("lat_min", T.LongType()),
    T.StructField("lon_max", T.LongType()),
    T.StructField("lat_max", T.LongType()),
])


def dissolve_components(labeled_points: DataFrame) -> DataFrame:
    """Per-component dissolve (`ST_UNION(ST_ACCUM(...))` analogue,
    `SpatialUnits.groovy:436-451`): convex hull area (degrees²) + bbox of
    each component's points. Grouped applyInPandas — the per-group work is
    O(n log n) hull on the component's own points only."""
    from .. import geometry

    def run(groups: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for g in groups:
            lon = g["lon_e6"].to_numpy(np.int64)
            lat = g["lat_e6"].to_numpy(np.int64)
            pts = np.column_stack([lon / 1e6, lat / 1e6])
            hull = geometry.convex_hull(pts) if len(pts) >= 3 else pts
            area = geometry.poly_area(hull) if len(hull) >= 3 else 0.0
            yield pd.DataFrame([{
                "component": int(g["component"].iloc[0]),
                "n_points": len(g),
                "hull_area": float(area),
                "lon_min": int(lon.min()), "lat_min": int(lat.min()),
                "lon_max": int(lon.max()), "lat_max": int(lat.max()),
            }])

    return labeled_points.groupBy("component").applyInPandas(run, HULL_SCHEMA)
