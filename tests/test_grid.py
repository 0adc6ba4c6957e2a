from __future__ import annotations

import numpy as np
import pytest

from geoclimate_spark import grid


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(7)
    for res in (0, 5, 12, grid.MAX_RES):
        x = rng.integers(0, grid.nx(res), 100)
        y = rng.integers(0, grid.ny(res), 100)
        c = grid.pack_np(x, y, res)
        r2, x2, y2 = grid.unpack_np(c)
        assert (r2 == res).all() and (x2 == x).all() and (y2 == y).all()


def test_cell_np_known_points():
    # (0,0) at res 1 → world is 4x2 cells → x=2, y=1
    c = grid.cell_np([0], [0], 1)
    r, x, y = grid.unpack_np(c)
    assert (x[0], y[0]) == (2, 1)
    # extreme corners clamp into range
    c = grid.cell_np([180_000_000], [90_000_000], 3)
    _, x, y = grid.unpack_np(c)
    assert x[0] == grid.nx(3) - 1 and y[0] == grid.ny(3) - 1


def test_parent_contains_child():
    rng = np.random.default_rng(11)
    lon = rng.integers(-180_000_000, 180_000_000, 500)
    lat = rng.integers(-90_000_000, 90_000_000, 500)
    child = grid.cell_np(lon, lat, 14)
    parent = grid.parent_np(child, 10)
    direct = grid.cell_np(lon, lat, 10)
    assert (parent == direct).all()


def test_cell_bounds_contains_point():
    lon, lat = np.asarray([2_350_000]), np.asarray([48_850_000])
    c = grid.cell_np(lon, lat, 12)
    lo0, la0, lo1, la1 = grid.cell_bounds_np(c)
    assert lo0[0] <= 2.35 < lo1[0] and la0[0] <= 48.85 < la1[0]


def test_kring_counts_and_wrap():
    c = grid.cell_np([0], [0], 6)[0]
    assert len(grid.kring_np(c, 1)) == 9
    assert len(grid.kring_np(c, 2)) == 25
    # cell on the antimeridian edge: x wraps, count preserved
    west = grid.cell_np([-179_999_999], [0], 6)[0]
    ring = grid.kring_np(west, 1)
    assert len(ring) == 9
    _, xs, _ = grid.unpack_np(ring)
    assert xs.min() == 0 and xs.max() == grid.nx(6) - 1
    # polar cell: lat clamps, ring shrinks
    pole = grid.cell_np([0], [89_999_999], 6)[0]
    assert len(grid.kring_np(pole, 1)) == 6


def test_cover_bbox():
    cells = grid.cover_bbox_np(-1.0, -1.0, 1.0, 1.0, 8)
    lo0, la0, lo1, la1 = grid.cell_bounds_np(cells)
    # covering must contain the bbox
    assert lo0.min() <= -1.0 and lo1.max() >= 1.0
    assert la0.min() <= -1.0 and la1.max() >= 1.0


def test_spark_sql_numpy_three_way_parity(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    lon = rng.integers(-180_000_000, 180_000_000, 1000)
    lat = rng.integers(-90_000_000, 90_000_000, 1000)
    pdf = pd.DataFrame({"lon_e6": lon, "lat_e6": lat})
    sdf = spark.createDataFrame(pdf)
    for res in (4, 12, grid.MAX_RES):
        via_col = sdf.select(grid.cell_col(F.col("lon_e6"), F.col("lat_e6"), res)
                             .alias("c")).toPandas()["c"].to_numpy()
        via_sql = sdf.selectExpr(f"{grid.cell_sql('lon_e6', 'lat_e6', res)} as c") \
                     .toPandas()["c"].to_numpy()
        via_np = grid.cell_np(lon, lat, res)
        assert (via_col == via_np).all()
        assert (via_sql == via_np).all()


def test_res_cap_enforced():
    from pyspark.sql import functions as F

    with pytest.raises(ValueError):
        grid.cell_col(F.lit(0), F.lit(0), grid.MAX_RES + 1)
    with pytest.raises(ValueError):
        grid.cell_sql("0", "0", grid.MAX_RES + 1)


def test_zorder_three_forms_agree_and_cluster(spark, duck):
    import numpy as np
    from pyspark.sql import functions as F
    from geoclimate_spark import grid

    lons = np.array([-180_000_000, -1, 0, 1, 2_349_000, 179_999_999,
                     -73_985_000, 139_691_000])
    lats = np.array([-90_000_000, -1, 0, 1, 48_853_000, 89_999_999,
                     40_748_000, 35_689_000])
    want = grid.zorder_np(lons, lats)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(lons, lats)], "lon long, lat long")
    got = [r.z for r in df.select(
        grid.zorder_col(F.col("lon"), F.col("lat")).alias("z"))
        .collect()]
    assert got == list(want)
    rows = ", ".join(f"({a}, {b})" for a, b in zip(lons, lats))
    sql = (f"SELECT {grid.zorder_sql('lon', 'lat')} AS z "
           f"FROM (VALUES {rows}) AS t(lon, lat)")
    assert [int(v) for (v,) in duck.execute(sql).fetchall()] == list(want)

    # locality: z-order-adjacent points are spatially closer on average
    # than id-order-adjacent points (the reason the key exists)
    rng_lon = ((np.arange(400) * 2654435761) % 360_000_000) - 180_000_000
    rng_lat = ((np.arange(400) * 40503 * 65537) % 180_000_000) - 90_000_000
    z = grid.zorder_np(rng_lon, rng_lat)
    order = np.argsort(z, kind="stable")
    d = lambda idx: float(np.mean(
        np.abs(np.diff(rng_lon[idx].astype(float)))
        + np.abs(np.diff(rng_lat[idx].astype(float)))))
    assert d(order) < d(np.arange(400)) / 2
