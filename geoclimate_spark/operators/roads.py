"""Line-layer zonal operators — the `linearRoadOperations` analogue.

Reference: clip roads to each zone, then per-zone totals: clipped length,
linear density (length / zone area) and length per azimuth direction bin
(`/root/reference/geoindicators/.../RsuIndicators.groovy:979-1143`; road
attribute schema `osm/InputDataFormatting.groovy:290`).

Spark-first: segments are rows (x0, y0, x1, y1 integer µ°); clipping a
segment to a rect zone is Liang–Barsky in pure column arithmetic — the
parametric entry/exit times come from double divisions of exact integer
differences, evaluated in the same operation order in Spark and DuckDB, so
clipped lengths are bit-identical and the whole operator is oracle-checked
(no UDF, no shuffle beyond the final zonal aggregation; zones broadcast).

Degeneracy contract: the synthetic road generator guarantees dx != 0 and
dy != 0 (no axis-parallel segments) so no division by zero occurs — Spark
and DuckDB disagree on double x/0 (NULL vs inf), so the operator documents
this precondition instead of papering over it differently per engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .distribution import octant_bin_col, octant_bin_sql

N_DIR_BINS = 8


# ------------------------------------------------------------------ source
def synth_roads_rows(n: int = 400) -> list[tuple[int, int, int, int, int]]:
    """(road_id, x0, y0, x1, y1) deterministic LCG segments, dx>0 and dy!=0
    guaranteed (see module docstring)."""
    rows = []
    s = 987_653
    for k in range(n):
        s = (s * 48_271 + 11) % 2_147_483_647
        x0 = s % 330_000_000 - 170_000_000
        s = (s * 48_271 + 11) % 2_147_483_647
        y0 = s % 130_000_000 - 70_000_000
        s = (s * 48_271 + 11) % 2_147_483_647
        dx = 500_000 + s % 12_000_000          # > 0 always
        s = (s * 48_271 + 11) % 2_147_483_647
        dy = (s % 9_000_000) - 4_500_000
        if dy == 0:
            dy = 1_000                          # never axis-parallel
        rows.append((k, x0, y0, x0 + dx, y0 + dy))
    return rows


def roads_df(spark) -> DataFrame:
    return spark.createDataFrame(
        synth_roads_rows(), "road_id long, x0 long, y0 long, x1 long, y1 long")


def roads_values_sql() -> str:
    vals = ",\n  ".join(f"({r}, {a}, {b}, {c}, {d})"
                        for r, a, b, c, d in synth_roads_rows())
    return ("SELECT CAST(road_id AS BIGINT) AS road_id,"
            " CAST(x0 AS BIGINT) AS x0, CAST(y0 AS BIGINT) AS y0,"
            " CAST(x1 AS BIGINT) AS x1, CAST(y1 AS BIGINT) AS y1"
            " FROM (VALUES\n  " + vals + "\n) AS t(road_id, x0, y0, x1, y1)")


# ---------------------------------------------------------------- operator
def _clip_frac_cols() -> tuple[Column, Column]:
    """(t_enter, t_exit) of the segment within the zone rect — Liang–Barsky
    with the min/max formulation. Column refs: x0..y1 (segment, bigint),
    zlon0..zlat1 (zone rect, bigint)."""
    fx0 = (F.col("zlon0") - F.col("x0")).cast("double") / (F.col("x1") - F.col("x0")).cast("double")
    fx1 = (F.col("zlon1") - F.col("x0")).cast("double") / (F.col("x1") - F.col("x0")).cast("double")
    fy0 = (F.col("zlat0") - F.col("y0")).cast("double") / (F.col("y1") - F.col("y0")).cast("double")
    fy1 = (F.col("zlat1") - F.col("y0")).cast("double") / (F.col("y1") - F.col("y0")).cast("double")
    t_enter = F.greatest(F.least(fx0, fx1), F.least(fy0, fy1), F.lit(0.0))
    t_exit = F.least(F.greatest(fx0, fx1), F.greatest(fy0, fy1), F.lit(1.0))
    return t_enter, t_exit


def _clip_frac_sql() -> tuple[str, str]:
    fx0 = "(CAST(zlon0 - x0 AS DOUBLE) / CAST(x1 - x0 AS DOUBLE))"
    fx1 = "(CAST(zlon1 - x0 AS DOUBLE) / CAST(x1 - x0 AS DOUBLE))"
    fy0 = "(CAST(zlat0 - y0 AS DOUBLE) / CAST(y1 - y0 AS DOUBLE))"
    fy1 = "(CAST(zlat1 - y0 AS DOUBLE) / CAST(y1 - y0 AS DOUBLE))"
    t_enter = f"GREATEST(LEAST({fx0}, {fx1}), LEAST({fy0}, {fy1}), 0.0)"
    t_exit = f"LEAST(GREATEST({fx0}, {fx1}), GREATEST({fy0}, {fy1}), 1.0)"
    return t_enter, t_exit


def road_zone_stats(roads: DataFrame, zones: DataFrame) -> DataFrame:
    """Per-zone: clipped road length (µ° units), linear density, length per
    octant direction bin. Returns
    (zone_id, total_len, lin_density, dir0..dir7)."""
    j = roads.crossJoin(F.broadcast(zones))
    t_enter, t_exit = _clip_frac_cols()
    seg_len = F.sqrt(((F.col("x1") - F.col("x0")) * (F.col("x1") - F.col("x0"))
                      + (F.col("y1") - F.col("y0")) * (F.col("y1") - F.col("y0"))
                      ).cast("double"))
    frac = t_exit - t_enter
    clip_len = F.when(frac > 0, frac * seg_len).otherwise(F.lit(0.0))
    binc = octant_bin_col(F.col("x1") - F.col("x0"), F.col("y1") - F.col("y0"))
    zarea = ((F.col("zlon1") - F.col("zlon0"))
             * (F.col("zlat1") - F.col("zlat0"))).cast("double")
    # per-ROW rounding to integer milli-µ° BEFORE aggregation: float sums
    # are order-dependent across engines/partitions, integer sums are exact
    len_mi = F.round(clip_len * 1000).cast("long")
    c = (j.withColumn("_len", len_mi).where(F.col("_len") > 0)
         .withColumn("_bin", binc)
         .withColumn("_za", zarea))
    aggs = [F.sum(F.when(F.col("_bin") == i, F.col("_len")).otherwise(F.lit(0)))
            .alias(f"_d{i}") for i in range(N_DIR_BINS)]
    g = c.groupBy("zone_id").agg(F.sum("_len").alias("_t"),
                                 F.max("_za").alias("_za"), *aggs)
    return g.select(
        "zone_id",
        (F.col("_t").cast("double") / 1000.0).alias("total_len"),
        (F.col("_t").cast("double") / 1000.0 / F.col("_za") * F.lit(1e6)
         ).alias("lin_density"),
        *[(F.col(f"_d{i}").cast("double") / 1000.0).alias(f"dir{i}")
          for i in range(N_DIR_BINS)])


def road_zone_stats_sql(roads_sql: str, zones_sql: str) -> str:
    t_enter, t_exit = _clip_frac_sql()
    seg_len = "SQRT(CAST((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0) AS DOUBLE))"
    binsql = octant_bin_sql("x1 - x0", "y1 - y0")
    dir_aggs = ",\n       ".join(
        f"CAST(SUM(CASE WHEN bin = {i} THEN len_mi ELSE 0 END) AS DOUBLE) / 1000.0 AS dir{i}"
        for i in range(N_DIR_BINS))
    return f"""WITH roads AS ({roads_sql}),
zones AS ({zones_sql}),
j AS (SELECT z.zone_id, r.*,
        z.zlon0, z.zlat0, z.zlon1, z.zlat1,
        CAST((z.zlon1 - z.zlon0) * (z.zlat1 - z.zlat0) AS DOUBLE) AS za
  FROM roads r, zones z),
c AS (SELECT zone_id, za, {binsql} AS bin,
        CAST(ROUND((CASE WHEN ({t_exit}) - ({t_enter}) > 0
             THEN (({t_exit}) - ({t_enter})) * {seg_len} ELSE 0.0 END) * 1000)
             AS BIGINT) AS len_mi
  FROM j)
SELECT zone_id,
       CAST(SUM(len_mi) AS DOUBLE) / 1000.0 AS total_len,
       CAST(SUM(len_mi) AS DOUBLE) / 1000.0 / MAX(za) * 1e6 AS lin_density,
       {dir_aggs}
FROM c WHERE len_mi > 0 GROUP BY zone_id"""