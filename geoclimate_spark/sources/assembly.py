"""Geometry assembly from ordered parts — the ways→polygons source operator.

Reference: OSM ways arrive as ordered node lists that must be assembled
into linestrings/polygons — `/root/reference/osmtools/src/main/groovy/org/
orbisgis/geoclimate/osmtools/utils/Transform.groovy:225` (ways→lines) and
`:301-318` (ring closing + polygon validity filter before use).

Spark-first shape: ``groupBy(way).agg(sort_array(collect_list(struct(seq,
x, y))))`` — the shuffle moves each way's parts to one row, the sort keys
on the part order (collect_list order is non-deterministic; the struct sort
restores it), the ring closes by appending the first point when the last
differs, and the metrics are higher-order array folds (JVM codegen, no
Python):

* ``area2_e6sq`` — |shoelace| doubled: exact int64 cross-product sum;
* ``perim_floor_e6`` — Σ FLOOR(√(dx²+dy²)) per edge: integer summands so
  partial-aggregation order cannot perturb the result (√ is correctly
  rounded per IEEE, FLOOR avoids engine cast/round divergence);
* validity = ≥3 distinct vertices (degenerate ways are dropped, the
  reference's ST_ISVALID-style filter).

The DuckDB oracle reconstructs the same rings with LEAD/FIRST_VALUE windows
(a different decomposition, same integer math) — assembly is hash-checked
end-to-end.

Scale: one shuffle keyed by way id; ways are bounded-size (OSM caps ways at
2000 nodes) so per-row arrays stay small; skewed mega-ways do not exist by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_rings(parts: DataFrame, way: str = "way_id", seq: str = "seq",
                   x: str = "x", y: str = "y") -> DataFrame:
    """(way_id, n_parts, n_ring_points, n_distinct, area2_e6sq,
    perim_floor_e6) for every way with >= 3 distinct vertices."""
    pt = F.struct(F.col(seq).cast("long").alias("seq"),
                  F.col(x).cast("long").alias("x"),
                  F.col(y).cast("long").alias("y"))
    g = (parts.groupBy(F.col(way).alias("way_id"))
         .agg(F.sort_array(F.collect_list(pt)).alias("pts")))
    first = F.col("pts")[0]
    last = F.element_at(F.col("pts"), -1)
    closed = (last["x"] == first["x"]) & (last["y"] == first["y"])
    ring = F.when(closed, F.col("pts")).otherwise(
        F.concat(F.col("pts"), F.array(first)))
    g = (g.withColumn("n_parts", F.size("pts").cast("long"))
         .withColumn("ring", ring)
         .withColumn("n_ring_points", F.size("ring").cast("long"))
         .withColumn("n_distinct", F.size(F.array_distinct(F.transform(
             F.col("pts"), lambda p: F.struct(p["x"], p["y"])))).cast("long")))
    idx = F.sequence(F.lit(0), F.size("ring") - 2)

    def _edge(i):
        a = F.element_at(F.col("ring"), i + 1)
        b = F.element_at(F.col("ring"), i + 2)
        return a, b

    def _cross(i):
        a, b = _edge(i)
        return a["x"] * b["y"] - b["x"] * a["y"]

    def _elen(i):
        a, b = _edge(i)
        d2 = ((b["x"] - a["x"]) * (b["x"] - a["x"])
              + (b["y"] - a["y"]) * (b["y"] - a["y"]))
        return F.floor(F.sqrt(d2.cast("double"))).cast("long")

    area2 = F.abs(F.aggregate(F.transform(idx, _cross),
                              F.lit(0).cast("long"), lambda acc, v: acc + v))
    perim = F.aggregate(F.transform(idx, _elen),
                        F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (g.where(F.col("n_distinct") >= 3)
            .select("way_id", "n_parts", "n_ring_points", "n_distinct",
                    area2.alias("area2_e6sq"), perim.alias("perim_floor_e6")))


def assemble_rings_sql(parts_sql: str, way: str = "way_id", seq: str = "seq",
                       x: str = "x", y: str = "y") -> str:
    """DuckDB mirror via LEAD/FIRST_VALUE windows: consecutive part edges
    plus the closing edge when the way is open."""
    return f"""WITH parts AS ({parts_sql}),
o AS (SELECT {way} AS way_id, {seq} AS seq, {x} AS x, {y} AS y,
       LEAD({x}) OVER w AS nx, LEAD({y}) OVER w AS ny,
       FIRST_VALUE({x}) OVER w AS fx, FIRST_VALUE({y}) OVER w AS fy,
       ROW_NUMBER() OVER w AS rn,
       COUNT(*) OVER (PARTITION BY {way}) AS n
  FROM parts WINDOW w AS (PARTITION BY {way} ORDER BY {seq} ASC)),
closedness AS (SELECT way_id, MAX(CASE WHEN rn = n AND x = fx AND y = fy
       THEN 1 ELSE 0 END) AS is_closed FROM o GROUP BY way_id),
edges AS (
  SELECT way_id, x, y, nx, ny FROM o WHERE rn < n
  UNION ALL
  SELECT o.way_id, o.x, o.y, o.fx AS nx, o.fy AS ny
  FROM o JOIN closedness c USING (way_id)
  WHERE o.rn = o.n AND c.is_closed = 0),
met AS (SELECT way_id,
       ABS(CAST(SUM(x * ny - nx * y) AS BIGINT)) AS area2_e6sq,
       CAST(SUM(CAST(FLOOR(SQRT(CAST((nx - x) * (nx - x)
            + (ny - y) * (ny - y) AS DOUBLE))) AS BIGINT)) AS BIGINT) AS perim_floor_e6
  FROM edges GROUP BY way_id),
stats AS (SELECT way_id, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT (x, y)) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) + 1 - MAX(CASE WHEN rn = n AND x = fx AND y = fy
            THEN 1 ELSE 0 END) AS BIGINT) AS n_ring_points
  FROM o GROUP BY way_id)
SELECT s.way_id, s.n_parts, s.n_ring_points, s.n_distinct,
       m.area2_e6sq, m.perim_floor_e6
FROM stats s JOIN met m USING (way_id)
WHERE s.n_distinct >= 3"""
