"""SMBR direction distribution — hand-checked geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoclimate_spark.operators import smbr


def _pts(spark, rows):
    return spark.createDataFrame(rows, "component long, pid long, x long, y long")


def test_axis_aligned_rectangle(spark):
    """4 corners of a 40x10 axis-aligned rect: SMBR is the rect itself —
    long side 40 along 0° (bin 0), short side 10 along 90° (bin 3)."""
    pts = _pts(spark, [(1, 1, 0, 0), (1, 2, 40, 0), (1, 3, 0, 10), (1, 4, 40, 10)])
    w = smbr.smbr_direction_weights(smbr.smbr_per_component(pts)).toPandas()
    got = dict(zip(w["bin"], w["w"]))
    assert got == {0: 40, 3: 10}


def test_diagonal_line_45deg(spark):
    """Collinear points along 45°: zero-width rect, length in bin 1."""
    pts = _pts(spark, [(1, 1, 0, 0), (1, 2, 10, 10), (1, 3, 20, 20)])
    w = smbr.smbr_direction_weights(smbr.smbr_per_component(pts)).toPandas()
    got = dict(zip(w["bin"], w["w"]))
    # 45° is in [30,60) → bin 1; length floor(|(20,20)|) = floor(28.28) = 28
    assert got[1] == 28
    # the perpendicular (135° → bin 4) has zero extent
    assert got[4] == 0


def test_tilted_rectangle_beats_axis_bbox(spark):
    """A thin rect rotated 45°: SMBR area must be the thin rect, not the
    fat axis-aligned bbox."""
    # corners of a rect with long axis along (1,1): (0,0),(30,30),(-5,5),(25,35)
    pts = _pts(spark, [(1, 1, 0, 0), (1, 2, 30, 30), (1, 3, -5, 5), (1, 4, 25, 35)])
    out = smbr.smbr_per_component(pts).toPandas().iloc[0]
    # winning direction must be diagonal, not axis-aligned
    assert out.dx != 0 and out.dy != 0
    area = (out.d_p / (out.len2 ** 0.5)) * (out.d_c / (out.len2 ** 0.5))
    assert abs(area - (30 * (2 ** 0.5)) * (5 * (2 ** 0.5))) < 1e-6


def test_singleton_components_dropped(spark):
    pts = _pts(spark, [(1, 1, 0, 0), (2, 2, 5, 5), (2, 3, 9, 5)])
    out = smbr.smbr_per_component(pts).toPandas()
    assert set(out.component) == {2}


def _lcg_pts(seed, n, bound):
    s, out = seed, []
    for _ in range(n):
        s = (s * 48_271 + 11) % 2_147_483_647
        x = s % (2 * bound + 1) - bound
        s = (s * 48_271 + 11) % 2_147_483_647
        y = s % (2 * bound + 1) - bound
        out.append((x, y))
    return out


def test_calipers_matches_bruteforce():
    """Big-component path (hull + rotating calipers) must produce the same
    winner as the oracle's full pair-direction scan on random clouds —
    verifying the hull-edge restriction loses nothing on generic inputs."""
    import numpy as np

    for seed in (3, 17, 91, 555, 12345):
        pts = sorted(set(_lcg_pts(seed, 200, 1_000_000)))
        xs = np.array([p[0] for p in pts], np.int64)
        ys = np.array([p[1] for p in pts], np.int64)
        assert smbr._calipers_winner(pts) == smbr._brute_winner(xs, ys), seed


def test_points_on_circle_adversarial():
    """Worst case for the old O(h³) hull-pair scan: every point is a hull
    vertex. Calipers must agree with brute force at a feasible size and
    stay fast at a size where the cubic scan would take hours."""
    import math
    import time

    import numpy as np

    def circle(n, r):
        return sorted({(round(r * math.cos(2 * math.pi * k / n)),
                        round(r * math.sin(2 * math.pi * k / n)))
                       for k in range(n)})

    small = circle(400, 10_000_000)
    xs = np.array([p[0] for p in small], np.int64)
    ys = np.array([p[1] for p in small], np.int64)
    assert smbr._calipers_winner(small) == smbr._brute_winner(xs, ys)

    big = circle(40_000, 1_000_000_000)
    t0 = time.perf_counter()
    dx, dy, len2, d_p, d_c = smbr._calipers_winner(big)
    dt = time.perf_counter() - t0
    assert dt < 30.0  # O(n log n); the old scan is ~h³ = 6.4e13 ops here
    # sanity: the SMBR of a near-circle is near the circumscribed square
    area = (d_p / math.sqrt(len2)) * (d_c / math.sqrt(len2))
    assert abs(area - 4e18) / 4e18 < 1e-3


def test_spark_path_uses_calipers_for_big_components(spark):
    """End-to-end through smbr_per_component: a >PAIR_SCAN_MAX component
    (calipers path) and a small one (brute path) in one frame."""
    import numpy as np

    pts_big = sorted(set(_lcg_pts(7, 3 * smbr.PAIR_SCAN_MAX, 500_000)))
    pts_small = sorted(set(_lcg_pts(8, 10, 500_000)))
    rows = ([(1, i, x, y) for i, (x, y) in enumerate(pts_big)]
            + [(2, i, x, y) for i, (x, y) in enumerate(pts_small)])
    out = (smbr.smbr_per_component(_pts(spark, rows))
           .toPandas().set_index("component").sort_index())
    for comp, pts in ((1, pts_big), (2, pts_small)):
        xs = np.array([p[0] for p in pts], np.int64)
        ys = np.array([p[1] for p in pts], np.int64)
        exp = smbr._brute_winner(xs, ys)
        got = tuple(int(v) for v in out.loc[comp,
                    ["dx", "dy", "len2", "d_p", "d_c"]])
        assert got == exp, comp


def test_sector_bin_matches_atan2_reference(spark):
    """The integer-comparison sector binning must agree with a float atan2
    reference on random integer vectors (boundaries are unreachable for
    integer inputs, so the two can never legitimately disagree)."""
    import math
    import random
    rng = random.Random(7)
    rows = []
    for i in range(500):
        dx = rng.randint(-1000, 1000)
        dy = rng.randint(-1000, 1000)
        if dx == 0 and dy == 0:
            continue
        # normalize to upper half-plane like the operator does
        if dy < 0 or (dy == 0 and dx < 0):
            dx, dy = -dx, -dy
        ang = math.degrees(math.atan2(dy, dx)) % 180.0
        rows.append((i, dx, dy, int(ang // 30)))
    df = spark.createDataFrame(rows, "i long, dx long, dy long, exp long")
    got = df.select("i", "exp",
                    smbr.sector_bin_col(F.col("dx"), F.col("dy")).alias("bin")
                    ).toPandas()
    assert (got.bin == got.exp).all()
