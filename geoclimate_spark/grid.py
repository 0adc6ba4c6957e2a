"""Hierarchical cell index ("gqt" — grid quadtree) over lon/lat.

The reference indexes space two ways: a rectangular grid with (id_row, id_col)
(`/root/reference/geoindicators/.../SpatialUnits.groovy:561-625` ST_MakeGrid) and
multiscale LOD re-aggregation `ID_ROW_LOD_i = (ABS(ID_ROW-1)/3^i)+1`
(`GridIndicators.groovy:142-165`). H3/S2 libs are not available in this
environment, so we ship an equivalent deterministic hierarchical index:

- resolution ``r`` ∈ [0, 26]; the world splits into ``2^(r+1) × 2^r`` equal
  lon/lat cells (square in degrees).
- cell id packs ``(r, x, y)`` into one int64: ``(r << 58) | (x << 29) | y``.
- ``parent`` is a bit shift (H3's ``h3_to_parent`` analogue, exact containment —
  better than H3, whose children only approximately nest).
- ``kring`` is the 8/24/...-neighborhood with longitude wraparound (H3 kRing
  analogue; used for distance joins as in `BuildingIndicators.groovy:322`
  ST_EXPAND→bbox-join trick).

Everything has three implementations that agree bit-for-bit:
1. Spark Column expressions (JVM-side, whole-stage-codegen'd — the hot path),
2. ANSI SQL strings (for the DuckDB oracle),
3. numpy (driver-side covering computations + test oracles).

Cell assignment uses *integer microdegree* arithmetic (``lon_e6``), never
floats, so all three paths are exactly reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Res cap 22 (~4.8 m cells): keeps every intermediate product
# (lon_e6 + 180e6) * nx(res) < 2^52, so the shared "(a - a % c) / c" integer
# division is bit-exact in Spark, DuckDB and numpy alike (no double rounding).
MAX_RES = 22
_X_SHIFT = 29
_R_SHIFT = 58
_XY_MASK = (1 << _X_SHIFT) - 1

LON_SCALE = 1_000_000  # microdegrees
FULL_LON_E6 = 360 * LON_SCALE
FULL_LAT_E6 = 180 * LON_SCALE


def nx(res: int) -> int:
    return 1 << (res + 1)


def ny(res: int) -> int:
    return 1 << res


def cell_width_deg(res: int) -> float:
    return 360.0 / nx(res)


# ---------------------------------------------------------------- numpy path
def xy_np(lon_e6: np.ndarray, lat_e6: np.ndarray, res: int):
    """Integer cell coordinates from integer microdegrees (vectorized)."""
    lon_e6 = np.asarray(lon_e6, dtype=np.int64)
    lat_e6 = np.asarray(lat_e6, dtype=np.int64)
    x = (lon_e6 + 180 * LON_SCALE) * nx(res) // FULL_LON_E6
    y = (lat_e6 + 90 * LON_SCALE) * ny(res) // FULL_LAT_E6
    x = np.clip(x, 0, nx(res) - 1)
    y = np.clip(y, 0, ny(res) - 1)
    return x, y


def pack_np(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    return (np.int64(res) << _R_SHIFT) | (np.asarray(x, np.int64) << _X_SHIFT) | np.asarray(y, np.int64)


def cell_np(lon_e6, lat_e6, res: int) -> np.ndarray:
    x, y = xy_np(lon_e6, lat_e6, res)
    return pack_np(x, y, res)


def unpack_np(cell: np.ndarray):
    cell = np.asarray(cell, dtype=np.int64)
    r = cell >> _R_SHIFT
    x = (cell >> _X_SHIFT) & _XY_MASK
    y = cell & _XY_MASK
    return r, x, y


def parent_np(cell: np.ndarray, parent_res: int) -> np.ndarray:
    r, x, y = unpack_np(cell)
    dr = r - parent_res
    if np.any(dr < 0):
        raise ValueError("parent_res must be <= cell res")
    return pack_np(x >> dr, y >> dr, parent_res)


def cell_bounds_np(cell: np.ndarray):
    """(lon0, lat0, lon1, lat1) degrees of each cell (float64)."""
    r, x, y = unpack_np(cell)
    w = 360.0 / (1 << (r + 1))
    h = 180.0 / (1 << r)
    lon0 = -180.0 + x * w
    lat0 = -90.0 + y * h
    return lon0, lat0, lon0 + w, lat0 + h


def kring_np(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (incl. self); lon wraps, lat clamps."""
    r, x, y = unpack_np(np.asarray([cell]))
    r, x, y = int(r[0]), int(x[0]), int(y[0])
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (x + dx.ravel()) % nx(r)
    ys = y + dy.ravel()
    keep = (ys >= 0) & (ys < ny(r))
    return pack_np(xs[keep], ys[keep], r)


def cover_bbox_np(lon0: float, lat0: float, lon1: float, lat1: float, res: int) -> np.ndarray:
    """Cells whose rectangle intersects the bbox (degrees, no antimeridian split)."""
    e6 = lambda v: int(round(v * LON_SCALE))
    x0, y0 = xy_np(np.asarray([e6(lon0)]), np.asarray([e6(lat0)]), res)
    x1, y1 = xy_np(np.asarray([e6(lon1)]), np.asarray([e6(lat1)]), res)
    xs = np.arange(int(x0[0]), int(x1[0]) + 1)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return pack_np(gx.ravel(), gy.ravel(), res)


# ---------------------------------------------------------------- Spark path
def _idiv_col(num: Column, den: int) -> Column:
    """Exact floor-division of a non-negative bigint Column by a constant.

    (num - num % den) / den: numerator is an exact multiple of den and stays
    < 2^52 for res <= MAX_RES, so the double division is exact.
    """
    return ((num - num % F.lit(den)) / F.lit(den)).cast("long")


def cell_col(lon_e6: Column, lat_e6: Column, res: int) -> Column:
    """Cell id as a pure-integer Column expression (codegen'd, no UDF)."""
    if res > MAX_RES:
        raise ValueError(f"res {res} > MAX_RES {MAX_RES}")
    x = _idiv_col((lon_e6.cast("long") + F.lit(180 * LON_SCALE)) * F.lit(nx(res)), FULL_LON_E6)
    y = _idiv_col((lat_e6.cast("long") + F.lit(90 * LON_SCALE)) * F.lit(ny(res)), FULL_LAT_E6)
    x = F.least(F.greatest(x, F.lit(0)), F.lit(nx(res) - 1))
    y = F.least(F.greatest(y, F.lit(0)), F.lit(ny(res) - 1))
    return (F.lit(res).cast("long") * F.lit(1 << _R_SHIFT)
            + x * F.lit(1 << _X_SHIFT) + y).cast("long")


def parent_col(cell: Column, parent_res: int, child_res: int) -> Column:
    dr = child_res - parent_res
    x = F.shiftright(cell, _X_SHIFT).bitwiseAND(F.lit(_XY_MASK))
    y = cell.bitwiseAND(F.lit(_XY_MASK))
    return (F.lit(parent_res).cast("long") * F.lit(1 << _R_SHIFT)
            + F.shiftright(x, dr) * F.lit(1 << _X_SHIFT) + F.shiftright(y, dr)).cast("long")


def cell_x_col(cell: Column) -> Column:
    return F.shiftright(cell, _X_SHIFT).bitwiseAND(F.lit(_XY_MASK))


def cell_y_col(cell: Column) -> Column:
    return cell.bitwiseAND(F.lit(_XY_MASK))


# ------------------------------------------------------------------ SQL path
def cell_sql(lon_e6_sql: str, lat_e6_sql: str, res: int) -> str:
    """ANSI-SQL (DuckDB-compatible) equivalent of :func:`cell_col`.

    Same (a - a % c) / c exact integer division as :func:`cell_col`; the
    product stays < 2^52 for res <= MAX_RES so the double division is exact.
    """
    if res > MAX_RES:
        raise ValueError(f"res {res} > MAX_RES {MAX_RES}")
    def idiv(num: str, den: int) -> str:
        return f"(({num}) - (({num}) % {den})) / {den}"

    x = idiv(f"(({lon_e6_sql}) + {180 * LON_SCALE}) * {nx(res)}", FULL_LON_E6)
    y = idiv(f"(({lat_e6_sql}) + {90 * LON_SCALE}) * {ny(res)}", FULL_LAT_E6)
    x = f"LEAST(GREATEST(CAST({x} AS BIGINT), 0), {nx(res) - 1})"
    y = f"LEAST(GREATEST(CAST({y} AS BIGINT), 0), {ny(res) - 1})"
    return (f"(CAST({res} AS BIGINT) * {1 << _R_SHIFT} + ({x}) * {1 << _X_SHIFT} + ({y}))")


# ---------------------------------------------------------------- z-order key
# Morton/Z-order sort key — the storage-layout clustering primitive (Iceberg
# `sort_order z-order(lon, lat)` analogue): rows sorted/range-partitioned by
# this key land spatially-near pages in the same data files, so bbox scans
# prune file ranges instead of reading the world. 16 bits per axis (~5.5 m
# lon resolution at the equator) → 32-bit key. Three bit-for-bit-identical
# forms like the cell index: Column / SQL / numpy. Pure shifts and masks —
# whole-stage codegen in Spark, plain bigint ops in DuckDB.
ZBITS = 16
_Z_SPREAD = (  # (shift, mask) chain spreading 16 bits to even positions
    (8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _z_axis_np(v_e6: np.ndarray, off: int, full: int) -> np.ndarray:
    i = (v_e6.astype(np.int64) + off) * (1 << ZBITS) // full
    return np.clip(i, 0, (1 << ZBITS) - 1)


def zorder_np(lon_e6: np.ndarray, lat_e6: np.ndarray) -> np.ndarray:
    def spread(v):
        v = v.astype(np.int64)
        for s, m in _Z_SPREAD:
            v = (v | (v << s)) & m
        return v
    x = _z_axis_np(np.asarray(lon_e6), 180 * LON_SCALE, FULL_LON_E6)
    y = _z_axis_np(np.asarray(lat_e6), 90 * LON_SCALE, FULL_LAT_E6)
    return spread(x) | (spread(y) << 1)


def zorder_col(lon_e6: Column, lat_e6: Column) -> Column:
    def axis(v, off, full):
        i = _idiv_col((v.cast("long") + F.lit(off)) * F.lit(1 << ZBITS), full)
        return F.least(F.greatest(i, F.lit(0)), F.lit((1 << ZBITS) - 1))

    def spread(v):
        for s, m in _Z_SPREAD:
            v = v.bitwiseOR(F.shiftleft(v, s)).bitwiseAND(F.lit(m))
        return v
    x = spread(axis(lon_e6, 180 * LON_SCALE, FULL_LON_E6))
    y = spread(axis(lat_e6, 90 * LON_SCALE, FULL_LAT_E6))
    return x.bitwiseOR(F.shiftleft(y, 1)).cast("long")


def zorder_sql(lon_e6_sql: str, lat_e6_sql: str) -> str:
    def axis(v, off, full):
        p = f"((CAST(({v}) AS BIGINT) + {off}) * {1 << ZBITS})"
        i = f"(({p} - {p} % {full}) / {full})"
        return f"LEAST(GREATEST(CAST({i} AS BIGINT), 0), {(1 << ZBITS) - 1})"

    def spread(v):
        for s, m in _Z_SPREAD:
            v = f"(({v} | ({v} << {s})) & {m})"
        return v
    x = spread(axis(lon_e6_sql, 180 * LON_SCALE, FULL_LON_E6))
    y = spread(axis(lat_e6_sql, 90 * LON_SCALE, FULL_LAT_E6))
    return f"CAST(({x} | ({y} << 1)) AS BIGINT)"
