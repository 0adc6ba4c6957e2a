"""Histogram / distribution operators — GeoClimate's signature family.

The reference's shape (SURVEY.md §2.5): *bin a per-row direction into B
buckets as B conditional-sum columns per zone, then characterize the
distribution per zone* — `buildingDirectionDistribution`
(`/root/reference/geoindicators/.../GenericIndicators.groovy:291-411`) and
`distributionCharacterization` (`:448-675`, Perkins equality `:667-675`,
uniqueness `:655-659`). The reference computes the characterization ROW-WISE
in Groovy with batched inserts (`:513-534`); here it is pure columnar
arithmetic — no shuffle beyond the one zonal groupBy, no Python at all.

Direction binning: instead of the reference's SMBR azimuth (a geometry
libcall) we bin the page→zone-center direction into 8 octants using only
integer sign/magnitude comparisons on microdegree deltas — deliberately
avoiding atan2, whose last-ulp behavior differs across math libraries; the
CASE chain is bit-identical in Spark and DuckDB.

Characterization outputs (per zone, mirrors `getDistribIndicName`):
``main_bin`` (argmax, lowest-index tie-break), ``second_bin``, ``x1``/``x2``
(largest / 2nd-largest bin weights — x2 via the max-of-pairwise-min identity,
exact on integers), ``equality`` (Perkins Skill Score vs the uniform
distribution, fixed-order double sum → deterministic) and ``uniqueness``
(|x1−x2|/(x1+x2)).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BINS = 8


# ----------------------------------------------------------- direction bins
def octant_bin_col(dx: Column, dy: Column) -> Column:
    adx, ady = F.abs(dx), F.abs(dy)
    return (F.when((dx >= 0) & (dy >= 0) & (adx >= ady), 0)
             .when((dx >= 0) & (dy >= 0), 1)
             .when((dx < 0) & (dy >= 0) & (ady > adx), 2)
             .when((dx < 0) & (dy >= 0), 3)
             .when((dx < 0) & (dy < 0) & (adx >= ady), 4)
             .when((dx < 0) & (dy < 0), 5)
             .when((dx >= 0) & (dy < 0) & (ady > adx), 6)
             .otherwise(7).cast("long"))


def octant_bin_sql(dx: str, dy: str) -> str:
    adx, ady = f"ABS({dx})", f"ABS({dy})"
    return (f"CAST(CASE WHEN ({dx}) >= 0 AND ({dy}) >= 0 AND {adx} >= {ady} THEN 0 "
            f"WHEN ({dx}) >= 0 AND ({dy}) >= 0 THEN 1 "
            f"WHEN ({dx}) < 0 AND ({dy}) >= 0 AND {ady} > {adx} THEN 2 "
            f"WHEN ({dx}) < 0 AND ({dy}) >= 0 THEN 3 "
            f"WHEN ({dx}) < 0 AND ({dy}) < 0 AND {adx} >= {ady} THEN 4 "
            f"WHEN ({dx}) < 0 AND ({dy}) < 0 THEN 5 "
            f"WHEN ({dx}) >= 0 AND ({dy}) < 0 AND {ady} > {adx} THEN 6 "
            f"ELSE 7 END AS BIGINT)")


def direction_distribution(df: DataFrame, key: str, bin_col: Column,
                           weight: str, n_bins: int = N_BINS) -> DataFrame:
    """Per-zone conditional-sum bins: (key, b0..b{n-1}) integer weights."""
    b = bin_col.alias("_bin")
    w = F.col("_w")
    aggs = [F.sum(F.when(F.col("_bin") == i, w).otherwise(F.lit(0))).alias(f"b{i}")
            for i in range(n_bins)]
    return (df.select(key, b, F.col(weight).cast("long").alias("_w"))
            .groupBy(key).agg(*aggs))


def direction_distribution_sql(rows_sql: str, key: str, bin_sql: str,
                               weight: str, n_bins: int = N_BINS) -> str:
    sel = ",\n       ".join(
        f"CAST(SUM(CASE WHEN ({bin_sql}) = {i} THEN {weight} ELSE 0 END) AS BIGINT) AS b{i}"
        for i in range(n_bins))
    return f"WITH rows_in AS ({rows_sql})\nSELECT {key}, {sel}\nFROM rows_in GROUP BY {key}"


# -------------------------------------------------------- characterization
def characterize_distribution(df: DataFrame, key: str,
                              bins: list[str]) -> DataFrame:
    """Columnar distributionCharacterization over existing bin columns."""
    cols = [F.col(b).cast("long") for b in bins]
    x1 = F.greatest(*cols)
    x2 = F.greatest(*[F.least(a, b) for a, b in combinations(cols, 2)])
    main = None
    for i in range(len(bins) - 1, -1, -1):
        cond = cols[i] == x1
        main = F.when(cond, F.lit(i)) if main is None else F.when(cond, F.lit(i)).otherwise(main)
    # reversed construction makes the LOWEST matching index win
    second = None
    for i in range(len(bins) - 1, -1, -1):
        cond = (cols[i] == x2) & (F.lit(i) != main)
        second = (F.when(cond, F.lit(i)) if second is None
                  else F.when(cond, F.lit(i)).otherwise(second))
    total = None
    for c in cols:
        total = c if total is None else total + c
    mean = total.cast("double") / F.lit(float(len(bins)))
    eq_sum = None
    for c in cols:
        t = F.least(c.cast("double"), mean)
        eq_sum = t if eq_sum is None else eq_sum + t
    equality = F.when(total > 0, eq_sum / total.cast("double")).otherwise(F.lit(0.0))
    uniq = F.when((x1 + x2) > 0,
                  (x1 - x2).cast("double") / (x1 + x2).cast("double")
                  ).otherwise(F.lit(0.0))
    return df.select(
        key, *bins,
        main.cast("long").alias("main_bin"),
        F.coalesce(second, F.lit(-1)).cast("long").alias("second_bin"),
        x1.alias("x1"), x2.alias("x2"),
        equality.alias("equality"), uniq.alias("uniqueness"))


def characterize_distribution_sql(rows_sql: str, key: str,
                                  bins: list[str]) -> str:
    x1 = "GREATEST(" + ", ".join(bins) + ")"
    x2 = "GREATEST(" + ", ".join(
        f"LEAST({a}, {b})" for a, b in combinations(bins, 2)) + ")"
    main = "CASE " + " ".join(
        f"WHEN {b} = _x1 THEN {i}" for i, b in enumerate(bins)) + " END"
    second = "CASE " + " ".join(
        f"WHEN {b} = _x2 AND {i} != _main THEN {i}" for i, b in enumerate(bins)
    ) + " ELSE -1 END"
    total = " + ".join(bins)
    mean = f"CAST(_total AS DOUBLE) / {float(len(bins))!r}"
    eq_sum = " + ".join(f"LEAST(CAST({b} AS DOUBLE), _mean)" for b in bins)
    return f"""WITH rows_in AS ({rows_sql}),
ext AS (SELECT *, {x1} AS _x1, {x2} AS _x2, {total} AS _total FROM rows_in),
ext2 AS (SELECT *, CAST({main} AS BIGINT) AS _main, {mean} AS _mean FROM ext)
SELECT {key}, {", ".join(bins)},
       _main AS main_bin, CAST({second} AS BIGINT) AS second_bin,
       _x1 AS x1, _x2 AS x2,
       CASE WHEN _total > 0 THEN ({eq_sum}) / CAST(_total AS DOUBLE) ELSE 0.0 END AS equality,
       CASE WHEN _x1 + _x2 > 0 THEN CAST(_x1 - _x2 AS DOUBLE) / CAST(_x1 + _x2 AS DOUBLE) ELSE 0.0 END AS uniqueness
FROM ext2"""
