"""SMBR-azimuth building direction distribution — the real minimum-bounding-
rectangle weighting (replacing the octant point-offset simplification in
:mod:`distribution`).

Reference: `buildingDirectionDistribution` (`/root/reference/geoindicators/
.../GenericIndicators.groovy:291-411`): per building the minimum rectangle
(`ST_MINIMUMRECTANGLE`, `:318-321`), the lengths and azimuths of its two
perpendicular sides (`:325-332`), side lengths summed into fixed angle bins
over [0, 180) (`:343-349`), then `distributionCharacterization` per upper
zone (Perkins equality / uniqueness, `:356-358` — reused from
:mod:`distribution`).

Graft: "buildings" are page-proximity components (the createBlocks output);
the SMBR of a component's points is found with the hull-edge theorem — the
minimum-area enclosing rectangle has a side collinear with a hull edge, and
every hull edge is a point pair, so scanning ALL point-pair directions (a
superset) finds the exact optimum with no hull computation. That makes the
whole operator a pair-explode + aggregate, expressible identically in Spark
and DuckDB:

* per candidate direction (dx, dy): projection P = dx·x + dy·y and cross
  C = dx·y − dy·x over the component's points — exact int64; the enclosing
  rectangle area is (ΔP·ΔC)/len² evaluated in ONE fixed double expression
  (IEEE mul/div are exactly rounded → bit-identical across engines);
* candidate directions are gcd-REDUCED to primitive vectors and deduped,
  so parallel pairs collapse to one direction class; winner = lowest
  (area, dx, dy) — a deterministic, scale-invariant window top-1 that is
  stable under hull reduction (the oracle scans all pairs, the engine only
  hull pairs, but both see every hull-EDGE direction class and rank the
  same way);
* side lengths FLOOR(ΔP/√len²), FLOOR(ΔC/√len²) (sqrt is correctly rounded
  everywhere, FLOOR avoids engine-specific cast/round rules);
* angle bins are 30° sectors of [0,180): tan²(30°) = 1/3 and tan²(60°) = 3
  are RATIONAL, so bin membership reduces to exact integer comparisons
  (3·dy² vs dx²); the irrational boundaries are unreachable for integer
  vectors, so no boundary ambiguity exists.

Scale: the engine reduces each component to its EXACT integer convex hull
first (:func:`hull_points`, Arrow-batched) and scans only hull-point pairs —
O(h³) with h ≪ n, valid by the hull-edge theorem; the DuckDB oracle keeps
the independent full O(n³) pair scan. All set operations are equi-joins on
the component id.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BINS = 6  # 30° sectors of [0, 180)
HULL_MIN_N = 64  # hull-reduce only components where the O(n³) scan dominates


def _int_hull(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Andrew's monotone chain on EXACT Python ints (float cross products
    overflow 2^53 at µ° magnitudes — a misclassified near-collinear point
    could drop a true hull vertex and flip the SMBR winner vs the oracle).
    ``pts`` must be sorted; collinear boundary points are dropped (their
    pair directions are parallel to the surviving edge, so the direction
    superset is unchanged)."""
    if len(pts) <= 2:
        return pts

    def half(seq):
        h: list[tuple[int, int]] = []
        for p in seq:
            while len(h) >= 2 and ((h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                                   - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return lower[:-1] + upper[:-1]


def hull_points(comp_pts: DataFrame) -> DataFrame:
    """Per-component exact convex hull vertices (min pid per coordinate).

    The scale lever for :func:`smbr_per_component`: the pair-direction scan
    is O(h³) on h hull points instead of O(n³) on all points — valid because
    the minimum enclosing rectangle has a side collinear with a hull EDGE
    (every hull-edge direction is a hull-point pair direction) and
    projection/cross extrema are attained at hull vertices. Arrow-batched
    per-component group work, bounded by component size.
    """
    schema = "component long, pid long, x long, y long"

    def run(groups: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for g in groups:
            comp = int(g["component"].iloc[0])
            by_xy = g.groupby(["x", "y"], as_index=False)["pid"].min()
            pts = sorted((int(x), int(y)) for x, y in
                         zip(by_xy["x"], by_xy["y"]))
            hull = set(_int_hull(pts))
            keep = by_xy[[(int(x), int(y)) in hull
                          for x, y in zip(by_xy["x"], by_xy["y"])]]
            yield pd.DataFrame({"component": comp, "pid": keep["pid"],
                                "x": keep["x"], "y": keep["y"]})

    return comp_pts.groupBy("component").applyInPandas(run, schema)


def _norm_dir(dx: Column, dy: Column) -> tuple[Column, Column]:
    """Normalize a direction into the upper half-plane: dy > 0, or
    dy == 0 and dx > 0."""
    flip = (dy < 0) | ((dy == 0) & (dx < 0))
    return (F.when(flip, -dx).otherwise(dx), F.when(flip, -dy).otherwise(dy))


def _gcd_col(a: Column, b: Column) -> Column:
    """Exact int64 gcd(|a|, |b|) as a fixed-iteration Euclid fold — pure
    column expression (JVM, codegen), no UDF. 48 iterations cover any
    |input| < 2^33 (worst case is consecutive Fibonacci numbers,
    log_phi(2^33) ~ 47); coordinate deltas here are < 2^29."""
    acc0 = F.struct(F.abs(a).cast("long").alias("a"),
                    F.abs(b).cast("long").alias("b"))
    step = lambda acc, _: F.struct(
        F.when(acc["b"] == 0, acc["a"]).otherwise(acc["b"]).alias("a"),
        F.when(acc["b"] == 0, F.lit(0).cast("long"))
        .otherwise(acc["a"] % acc["b"]).alias("b"))
    return F.aggregate(F.sequence(F.lit(1), F.lit(48)), acc0, step)["a"]


def sector_bin_col(dx: Column, dy: Column) -> Column:
    """30° sector of the normalized direction's angle in [0,180) — exact
    integer comparisons (see module docstring)."""
    dx2, dy2 = dx * dx, dy * dy
    return (F.when(dy == 0, F.lit(0))
            .when(dx == 0, F.lit(3))
            .when((dx > 0) & (dx2 > 3 * dy2), F.lit(0))         # [0,30)
            .when((dx > 0) & (dy2 < 3 * dx2), F.lit(1))         # [30,60)
            .when(dx > 0, F.lit(2))                             # [60,90)
            .when(3 * dy2 < dx2, F.lit(5))                      # (150,180)
            .when(dy2 <= 3 * dx2, F.lit(4))                     # [120,150]
            .otherwise(F.lit(3))                                # (90,120)
            .cast("long"))


def sector_bin_sql(dx: str, dy: str) -> str:
    return (f"CAST(CASE WHEN {dy} = 0 THEN 0 WHEN {dx} = 0 THEN 3 "
            f"WHEN {dx} > 0 AND {dx}*{dx} > 3*{dy}*{dy} THEN 0 "
            f"WHEN {dx} > 0 AND {dy}*{dy} < 3*{dx}*{dx} THEN 1 "
            f"WHEN {dx} > 0 THEN 2 "
            f"WHEN 3*{dy}*{dy} < {dx}*{dx} THEN 5 "
            f"WHEN {dy}*{dy} <= 3*{dx}*{dx} THEN 4 "
            f"ELSE 3 END AS BIGINT)")


def smbr_per_component(comp_pts: DataFrame) -> DataFrame:
    """Exact minimum-area enclosing rectangle per component.

    ``comp_pts``: (component, pid, x, y) int64 µ°; components need >= 2
    distinct points (singletons yield no pairs and are dropped, like
    degenerate point buildings). Returns one row per component:
    (component, dx, dy, len2, d_p, d_c) — winning direction (normalized),
    its squared length, and the projection/cross extents.
    """
    # hull-first, ADAPTIVE: components above HULL_MIN_N points are reduced
    # to their exact hull before the O(n³) scan (the asymptotic guard —
    # a 10^4-point block would otherwise cost 10^12 pair-extents); small
    # components skip the Arrow hop because per-tiny-group pandas overhead
    # exceeds the scan saved.
    nw = Window.partitionBy("component")
    sized = comp_pts.withColumn("_n", F.count("*").over(nw))
    small = sized.where(F.col("_n") <= HULL_MIN_N).drop("_n")
    big = sized.where(F.col("_n") > HULL_MIN_N).drop("_n")
    # consumed three times (both self-join sides + the extent join); the
    # upstream is typically a CC join with a long lineage — materialize once
    comp_pts = small.unionByName(hull_points(big)).persist()
    a, b = comp_pts.alias("a"), comp_pts.alias("b")
    raw = (a.join(b, (F.col("a.component") == F.col("b.component"))
                  & (F.col("a.pid") < F.col("b.pid")))
           .select(F.col("a.component").alias("component"),
                   (F.col("b.x") - F.col("a.x")).alias("_dx"),
                   (F.col("b.y") - F.col("a.y")).alias("_dy"))
           .where((F.col("_dx") != 0) | (F.col("_dy") != 0)))
    # gcd-reduce to the PRIMITIVE direction and dedup: parallel pairs
    # collapse to one (dx, dy) class, so the ranking below is invariant to
    # WHICH pairs produced a direction — hull-reduced engine and full-pair
    # oracle see identical direction classes wherever it matters (the
    # minimum-area direction is a hull-edge direction), and w/bin are
    # computed from the same primitive vector bit-for-bit on both sides.
    # Side benefit: the extent join fans out per distinct direction class,
    # not per point pair.
    ndx, ndy = _norm_dir(F.col("_dx"), F.col("_dy"))
    g = _gcd_col(ndx, ndy)
    dirs = (raw.select("component", (ndx / g).cast("long").alias("dx"),
                       (ndy / g).cast("long").alias("dy"))
            .distinct())
    p = comp_pts.select(F.col("component"), F.col("x"), F.col("y"))
    ext = (dirs.join(p, "component")
           .select("component", "dx", "dy",
                   (F.col("dx") * F.col("x") + F.col("dy") * F.col("y")).alias("_p"),
                   (F.col("dx") * F.col("y") - F.col("dy") * F.col("x")).alias("_c"))
           .groupBy("component", "dx", "dy")
           .agg((F.max("_p") - F.min("_p")).alias("d_p"),
                (F.max("_c") - F.min("_c")).alias("d_c")))
    len2 = (F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
    area = (F.col("d_p").cast("double") * F.col("d_c").cast("double")
            / len2.cast("double"))
    w = Window.partitionBy("component").orderBy(
        F.col("_area").asc(), F.col("dx").asc(), F.col("dy").asc())
    return (ext.withColumn("_area", area)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("component", "dx", "dy", len2.alias("len2"), "d_p", "d_c"))


def smbr_direction_weights(smbr: DataFrame) -> DataFrame:
    """Two weighted direction rows per component — the side ALONG the
    winning direction with extent ΔP, and the PERPENDICULAR side with ΔC
    (`GenericIndicators.groovy:325-332` LEN_L/LEN_H ⇔ ANG_L/ANG_H):
    (component, bin, w) with w = FLOOR(extent / √len²) bigint µ°."""
    ln = F.sqrt(F.col("len2").cast("double"))
    # perpendicular of (dx, dy) is (-dy, dx); renormalize to upper half
    pdx, pdy = _norm_dir(-F.col("dy"), F.col("dx"))
    along = smbr.select(
        "component", sector_bin_col(F.col("dx"), F.col("dy")).alias("bin"),
        F.floor(F.col("d_p").cast("double") / ln).cast("long").alias("w"))
    perp = smbr.select(
        "component", sector_bin_col(pdx, pdy).alias("bin"),
        F.floor(F.col("d_c").cast("double") / ln).cast("long").alias("w"))
    return along.unionByName(perp)


def smbr_sql(comp_pts_sql: str) -> str:
    """DuckDB mirror of smbr_per_component + smbr_direction_weights:
    emits (component, bin, w). ``comp_pts_sql`` selects
    (component, pid, x, y) BIGINT."""
    bin_d = sector_bin_sql("dx", "dy")
    bin_p = sector_bin_sql("pdx", "pdy")
    return f"""WITH comp_pts AS ({comp_pts_sql}),
raw AS (SELECT a.component,
       b.x - a.x AS rdx, b.y - a.y AS rdy
  FROM comp_pts a JOIN comp_pts b ON a.component = b.component
   AND a.pid < b.pid
  WHERE b.x != a.x OR b.y != a.y),
normed AS (SELECT component,
       CASE WHEN rdy < 0 OR (rdy = 0 AND rdx < 0) THEN -rdx ELSE rdx END AS ndx,
       CASE WHEN rdy < 0 OR (rdy = 0 AND rdx < 0) THEN -rdy ELSE rdy END AS ndy
  FROM raw),
dirs AS (SELECT DISTINCT component,
       CAST(ndx / gcd(abs(ndx), abs(ndy)) AS BIGINT) AS dx,
       CAST(ndy / gcd(abs(ndx), abs(ndy)) AS BIGINT) AS dy
  FROM normed),
ext AS (SELECT d.component, d.dx, d.dy,
       MAX(d.dx * p.x + d.dy * p.y) - MIN(d.dx * p.x + d.dy * p.y) AS d_p,
       MAX(d.dx * p.y - d.dy * p.x) - MIN(d.dx * p.y - d.dy * p.x) AS d_c
  FROM dirs d JOIN comp_pts p ON p.component = d.component
  GROUP BY 1, 2, 3),
scored AS (SELECT *, dx * dx + dy * dy AS len2,
       CAST(d_p AS DOUBLE) * CAST(d_c AS DOUBLE)
         / CAST(dx * dx + dy * dy AS DOUBLE) AS area,
       ROW_NUMBER() OVER (PARTITION BY component
           ORDER BY CAST(d_p AS DOUBLE) * CAST(d_c AS DOUBLE)
                    / CAST(dx * dx + dy * dy AS DOUBLE) ASC,
                    dx ASC, dy ASC) AS rn
  FROM ext),
win AS (SELECT component, dx, dy, len2, d_p, d_c FROM scored WHERE rn = 1),
perp AS (SELECT component, len2, d_c,
       CASE WHEN dx < 0 OR (dx = 0 AND dy > 0) THEN dy ELSE -dy END AS pdx,
       CASE WHEN dx < 0 OR (dx = 0 AND dy > 0) THEN -dx ELSE dx END AS pdy
  FROM win)
SELECT component, {bin_d} AS bin,
       CAST(FLOOR(CAST(d_p AS DOUBLE) / SQRT(CAST(len2 AS DOUBLE))) AS BIGINT) AS w
FROM win
UNION ALL
SELECT component, {bin_p} AS bin,
       CAST(FLOOR(CAST(d_c AS DOUBLE) / SQRT(CAST(len2 AS DOUBLE))) AS BIGINT) AS w
FROM perp"""
