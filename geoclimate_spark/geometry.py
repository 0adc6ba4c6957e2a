"""Pure-numpy planar geometry kernels (no shapely in this environment).

These implement the geometric predicates/measures the reference gets from
H2GIS spatial SQL — ST_AREA/ST_INTERSECTS/ST_INTERSECTION(area)/ST_DISTANCE —
with textbook algorithms (shoelace, even-odd ray casting, Sutherland–Hodgman
clipping). They run vectorized inside Arrow/pandas UDFs (never per-row Python,
per BASELINE.json input_hint) and double as driver-side test oracles.

Reference analogues:
- ST_AREA           -> :func:`poly_area`          (`GenericIndicators.groovy:241`)
- ST_INTERSECTS pt  -> :func:`points_in_polygon`  (`SpatialUnits.groovy:510-515`)
- ST_INTERSECTION
  area vs rect/convex -> :func:`clip_area_rect` / :func:`clip_convex`
  (top-1 largest-overlap rule, `SpatialUnits.groovy:517-529`)
- ST_DISTANCE       -> :func:`point_dist2`        (`BuildingIndicators.groovy:322-336`)

Polygons are (N,2) float64 arrays of vertices, implicitly closed (first vertex
not repeated). Rings are assumed non-self-intersecting; orientation-free
(areas use abs of signed shoelace).
"""

from __future__ import annotations

import numpy as np


def poly_area(poly: np.ndarray) -> float:
    """Unsigned shoelace area of a simple polygon."""
    x, y = poly[:, 0], poly[:, 1]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2.0


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Even-odd ray-cast test, vectorized over points; boundary points count IN.

    Standard crossing-number algorithm; the half-open edge treatment makes
    interior classification exact, and an explicit on-edge check makes boundary
    points deterministically inside (the reference's ST_INTERSECTS is
    boundary-inclusive, `SpatialUnits.groovy:513`).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(poly)
    inside = np.zeros(px.shape, dtype=bool)
    on_edge = np.zeros(px.shape, dtype=bool)
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for i in range(n):
        ax, ay, bx, by = x1[i], y1[i], x2[i], y2[i]
        # crossing test (half-open in y); horizontal edges (dy == 0) can
        # never satisfy cond, so skip them instead of dividing by zero.
        # A denormal dy can still overflow the quotient to ±inf — px < ±inf
        # stays a well-defined crossing decision, so only silence `over`.
        dy = by - ay
        if dy != 0.0:
            cond = (ay > py) != (by > py)
            with np.errstate(over="ignore"):
                xint = (bx - ax) * (py - ay) / dy + ax
            inside ^= cond & (px < xint)
        # on-edge: collinear and within segment bbox
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        within = (np.minimum(ax, bx) - 1e-12 <= px) & (px <= np.maximum(ax, bx) + 1e-12) & \
                 (np.minimum(ay, by) - 1e-12 <= py) & (py <= np.maximum(ay, by) + 1e-12)
        on_edge |= (np.abs(cross) < 1e-12) & within
    return inside | on_edge


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip arbitrary simple polygon by a CONVEX polygon.

    Returns the clipped polygon vertices ((M,2), possibly empty). The clip
    polygon must be convex and counter-clockwise.
    """
    out = subject
    n = len(clip)
    for i in range(n):
        if len(out) == 0:
            return out
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        # signed side of each subject vertex vs clip edge (ccw => inside >= 0)
        sx, sy = out[:, 0], out[:, 1]
        side = (bx - ax) * (sy - ay) - (by - ay) * (sx - ax)
        keep = side >= -1e-12
        nxt = np.roll(np.arange(len(out)), -1)
        new_pts = []
        for j in range(len(out)):
            k = nxt[j]
            if keep[j]:
                new_pts.append(out[j])
            if keep[j] != keep[k]:
                # edge crosses clip line: interpolate
                denom = side[j] - side[k]
                t = side[j] / denom if denom != 0 else 0.0
                new_pts.append(out[j] + t * (out[k] - out[j]))
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    return out


def rect_poly(lon0: float, lat0: float, lon1: float, lat1: float) -> np.ndarray:
    """CCW rectangle polygon."""
    return np.asarray([[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1]], dtype=np.float64)


def clip_area_rect(subject: np.ndarray, lon0, lat0, lon1, lat1) -> float:
    """Area of subject ∩ axis-aligned rect (the tile-overlap primitive)."""
    clipped = clip_convex(subject, rect_poly(lon0, lat0, lon1, lat1))
    return poly_area(clipped) if len(clipped) >= 3 else 0.0


def _segments_cross(p1, p2, q1, q2) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if abs(v) < 1e-15 else (1 if v > 0 else -1)

    o1, o2 = orient(p1, p2, q1), orient(p1, p2, q2)
    o3, o4 = orient(q1, q2, p1), orient(q1, q2, p2)
    if o1 != o2 and o3 != o4:
        return True
    def on(a, b, c):
        return (orient(a, b, c) == 0 and min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))
    return on(p1, p2, q1) or on(p1, p2, q2) or on(q1, q2, p1) or on(q1, q2, p2)


def rect_intersects_polygon(lon0, lat0, lon1, lat1, poly: np.ndarray) -> bool:
    """Exact rect×polygon intersection test (for tight cell coverings).

    True iff: a rect corner is in the polygon, OR a polygon vertex is in the
    rect, OR any boundary edges cross. Covers containment both ways + overlap.
    """
    rect = rect_poly(lon0, lat0, lon1, lat1)
    if points_in_polygon(rect[:, 0], rect[:, 1], poly).any():
        return True
    inx = (poly[:, 0] >= lon0) & (poly[:, 0] <= lon1) & (poly[:, 1] >= lat0) & (poly[:, 1] <= lat1)
    if inx.any():
        return True
    n, m = len(poly), 4
    for i in range(n):
        p1, p2 = poly[i], poly[(i + 1) % n]
        for j in range(m):
            if _segments_cross(p1, p2, rect[j], rect[(j + 1) % m]):
                return True
    return False


def point_dist2(ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray) -> np.ndarray:
    """Squared planar distance (degrees^2) — monotone, exact for argmin/knn."""
    dx = np.asarray(ax) - np.asarray(bx)
    dy = np.asarray(ay) - np.asarray(by)
    return dx * dx + dy * dy


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns CCW hull (for zone generation/tests)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)
