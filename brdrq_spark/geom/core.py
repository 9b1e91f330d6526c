"""Core geometry primitives: snapping, areas, distances, point-in-polygon.

All coordinates live in a projected, meter-unit CRS (the reference pins
EPSG:31370 — plugin/brdrq/brdrq_algorithm_autocorrectborders.py:194 — any
meter plane is equivalent). Coordinates are snapped to a ``SNAP`` grid
before any boolean op; the reference forgives micro-noise below its
``correction_distance`` of 0.01 m
(plugin/brdrq/brdrq_algorithm_autocorrectborders.py:193).
"""

from __future__ import annotations

import numpy as np

# Snap grid (meters). 1e-6 m: far below correction_distance (0.01 m),
# far above float64 ulp at coordinate magnitude ~1e6.
SNAP = 1e-6
_INV_SNAP = 1.0 / SNAP


def snap_ring(ring: np.ndarray) -> np.ndarray:
    """Snap ring vertices to the grid and drop consecutive duplicates."""
    r = np.asarray(ring, dtype=np.float64)
    r = np.round(r * _INV_SNAP) * SNAP
    if len(r) > 1:
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]).any(axis=1)
        r = r[keep]
        # drop closing duplicate if ring came closed
        if len(r) > 1 and (r[0] == r[-1]).all():
            r = r[:-1]
    return r


def rot1(r: np.ndarray) -> np.ndarray:
    """Ring rotated by one vertex (cheap np.roll replacement — np.roll
    carries ~15us of Python axis-normalization per call, which dominates
    in the boolean-op hot path)."""
    return np.concatenate((r[1:], r[:1]))


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (CCW positive)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    x2, y2 = rot1(x), rot1(y)
    return 0.5 * float(np.dot(x, y2) - np.dot(y, x2))


def rings_area(rings: list[np.ndarray]) -> float:
    """Total area of an orientation-encoded ring set (holes negative)."""
    return sum(ring_area(r) for r in rings)


def ring_perimeter(ring: np.ndarray) -> float:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) < 2:
        return 0.0
    d = rot1(r) - r
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def rings_perimeter(rings: list[np.ndarray]) -> float:
    return sum(ring_perimeter(r) for r in rings)


def bbox(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy); (inf, inf, -inf, -inf) when empty."""
    if not rings:
        return (float("inf"), float("inf"), float("-inf"), float("-inf"))
    mins = np.min([r.min(axis=0) for r in rings], axis=0)
    maxs = np.max([r.max(axis=0) for r in rings], axis=0)
    return (float(mins[0]), float(mins[1]), float(maxs[0]), float(maxs[1]))


def bbox_distance(
    a: tuple[float, float, float, float], b: tuple[float, float, float, float]
) -> float:
    """Min distance between two axis-aligned boxes (0 if overlapping)."""
    dx = max(a[0] - b[2], b[0] - a[2], 0.0)
    dy = max(a[1] - b[3], b[1] - a[3], 0.0)
    return float(np.hypot(dx, dy))


def point_in_rings(pts: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Vectorized nonzero-winding point-in-polygon over a ring set.

    ``pts``: (m, 2). Returns a bool array of length m. Points exactly on
    an edge may land either side (callers treat boundary as don't-care;
    the snap grid keeps this deterministic per input).
    """
    pts = np.asarray(pts, dtype=np.float64)
    if pts.ndim == 1:
        pts = pts[None, :]
    wind = np.zeros(len(pts), dtype=np.int64)
    px = pts[:, 0][:, None]
    py = pts[:, 1][:, None]
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 3:
            continue
        x0 = r[:, 0][None, :]
        y0 = r[:, 1][None, :]
        r2 = rot1(r)
        x1 = r2[:, 0][None, :]
        y1 = r2[:, 1][None, :]
        # upward crossings: y0 <= py < y1, point strictly left of edge
        cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        up = (y0 <= py) & (y1 > py) & (cross > 0)
        dn = (y1 <= py) & (y0 > py) & (cross < 0)
        wind += up.sum(axis=1) - dn.sum(axis=1)
    return wind != 0


def _seg_point_dist2(px, py, x0, y0, x1, y1):
    """Vectorized squared distance from points to segments (broadcasted)."""
    dx = x1 - x0
    dy = y1 - y0
    ll = dx * dx + dy * dy
    t = np.where(ll > 0, ((px - x0) * dx + (py - y0) * dy) / np.where(ll > 0, ll, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx = x0 + t * dx
    cy = y0 + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def _edges(rings: list[np.ndarray]) -> np.ndarray:
    """All edges of a ring set as an (e, 4) array [x0, y0, x1, y1]."""
    out = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) < 2:
            continue
        r2 = rot1(r)
        out.append(np.column_stack([r, r2]))
    if not out:
        return np.zeros((0, 4))
    return np.vstack(out)


def min_distance(a: list[np.ndarray], b: list[np.ndarray]) -> float:
    """Min distance between two polygon ring sets (0 when overlapping).

    Mirrors the reference's exact-distance refine step
    (plugin/brdrq/brdrq_dockwidget_featurealigner.py:1653-1667).
    """
    if not a or not b:
        return float("inf")
    ea = _edges(a)
    eb = _edges(b)
    # vertex-of-a vs edges-of-b and vice versa covers seg-seg distance
    # for non-crossing segments; crossing => containment check below.
    d2 = np.inf
    if len(ea) and len(eb):
        pa = ea[:, :2]
        d2 = min(
            d2,
            float(
                _seg_point_dist2(
                    pa[:, 0][:, None], pa[:, 1][:, None],
                    eb[:, 0][None, :], eb[:, 1][None, :],
                    eb[:, 2][None, :], eb[:, 3][None, :],
                ).min()
            ),
        )
        pb = eb[:, :2]
        d2 = min(
            d2,
            float(
                _seg_point_dist2(
                    pb[:, 0][:, None], pb[:, 1][:, None],
                    ea[:, 0][None, :], ea[:, 1][None, :],
                    ea[:, 2][None, :], ea[:, 3][None, :],
                ).min()
            ),
        )
    if d2 > 0:
        # one may contain the other entirely
        if point_in_rings(np.asarray(a[0][:1]), b).any() or point_in_rings(
            np.asarray(b[0][:1]), a
        ).any():
            return 0.0
        # crossing edges => distance 0 (cheap O(e_a * e_b) orientation test)
        if len(ea) and len(eb) and _any_cross(ea, eb):
            return 0.0
    return float(np.sqrt(max(d2, 0.0)))


def _any_cross(ea: np.ndarray, eb: np.ndarray) -> bool:
    ax0 = ea[:, 0][:, None]; ay0 = ea[:, 1][:, None]
    ax1 = ea[:, 2][:, None]; ay1 = ea[:, 3][:, None]
    bx0 = eb[:, 0][None, :]; by0 = eb[:, 1][None, :]
    bx1 = eb[:, 2][None, :]; by1 = eb[:, 3][None, :]

    def orient(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    d1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = orient(bx0, by0, bx1, by1, ax1, ay1)
    return bool(((d1 * d2 < 0) & (d3 * d4 < 0)).any())


def split_parts(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Decompose a (Multi)Polygon ring set into its polygon parts: each
    outer ring (positive area) grouped with the holes (negative area)
    it contains. Hole membership tests the hole's vertex centroid
    against each outer (nonzero winding). Single-part inputs return
    [rings] unchanged — the multi_as_single_modus=True path (reference
    brdrq_algorithm_autocorrectborders.py:192) aligns each part
    independently and recombines."""
    outers = [r for r in rings if ring_area(r) > 0]
    if len(outers) <= 1:
        return [list(rings)]
    holes = [r for r in rings if ring_area(r) <= 0]
    parts: list[list[np.ndarray]] = [[o] for o in outers]
    for h in holes:
        # vertex MAJORITY vote, not the vertex centroid: a concave
        # (U/L-shaped) hole's centroid can fall outside its enclosing
        # outer, but every vertex of a valid hole lies inside-or-on it —
        # the outer containing the most hole vertices wins
        hv = np.asarray(h, dtype=np.float64)
        votes = [int(point_in_rings(hv, [o]).sum()) for o in outers]
        best = int(np.argmax(votes))
        parts[best].append(h)
    return parts
