"""Buffer / erosion / morphological opening+closing via boundary capsules.

dilate(P, d)  = P ∪ capsules(boundary(P), d)
erode(P, d)   = P \\ capsules(boundary(P), d)
open(P, d)    = dilate(erode(P, d), d)      — drops slivers thinner than 2d
close(P, d)   = erode(dilate(P, d), d)      — fills gaps thinner than 2d

where capsules(boundary, d) is the union of one rectangle per boundary
segment (width 2d) and one regular N-gon disk per vertex — the Minkowski
sum of the boundary with a discretized disk. Round joins mirror the
reference's buffer (10 arc segments per quarter circle,
plugin/brdrq/brdrq_utils.py:1569-1590); we default to 8 segments per
quarter (32 per full circle).

The brdr relevance test — is ``buffer(intersection, -rd/2)`` empty? —
(observable contract, docs/autocorrectborders.md:80-84) maps to
``erode_area(I, rd/2) > 0``.
"""

from __future__ import annotations

import numpy as np

from brdrq_spark.geom.clip import area_of_op, boolean_op, _trapezoids, trapezoid_area
from brdrq_spark.geom.simplify import simplify_rings


_UNIT_DISKS: dict[int, np.ndarray] = {}


def _unit_disk(nseg: int) -> np.ndarray:
    disk = _UNIT_DISKS.get(nseg)
    if disk is None:
        ang = np.linspace(0.0, 2.0 * np.pi, nseg, endpoint=False)
        disk = np.column_stack([np.cos(ang), np.sin(ang)])
        _UNIT_DISKS[nseg] = disk
    return disk


def _disk(cx: float, cy: float, d: float, nseg: int) -> np.ndarray:
    return _unit_disk(nseg) * d + np.array([cx, cy])


def boundary_capsules(
    rings: list[np.ndarray], d: float, nseg: int = 32, joins: str = "all"
) -> list[np.ndarray]:
    """Ring blocks whose union is the d-neighborhood of the boundary.

    Vectorized per ring: one (n, 4, 2) block of edge rectangles (CCW)
    and one (n, nseg, 2) block of vertex disks — the boolean engine's
    edge collector consumes blocks without per-capsule Python.

    ``joins`` prunes vertex disks by which side of the boundary must be
    covered (polygon interior is left of travel for CCW outers AND CW
    holes alike):

    * "interior" (erosion): a convex corner's inside wedge is already
      covered by its two edge rectangles — disks only at right-turn
      (reflex-to-interior) vertices;
    * "exterior" (dilation): symmetric — disks only at left-turn
      vertices (the round outer join);
    * "all": both (boundary-neighborhood semantics).

    Pruning is exact up to scanbeam snap rounding (measured area deltas
    vs joins="all" ≲1e-4 m² on star polygons; near the _TINY decision
    threshold the two variants agree to ~1e-16, so relevance decisions
    don't flip), and capsule edge counts
    drop ~(4+nseg)/4 per vertex on convex-dominated parcel data — the
    erosion relevance tests are the alignment kernel's hot path.
    """
    from brdrq_spark.geom.core import rot1

    caps: list[np.ndarray] = []
    if d <= 0:
        return caps
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        n = len(r)
        if n < 2:
            continue
        r2 = rot1(r)
        dx = r2[:, 0] - r[:, 0]
        dy = r2[:, 1] - r[:, 1]
        ln = np.hypot(dx, dy)
        ok = ln > 0
        inv = np.where(ok, 1.0 / np.where(ok, ln, 1.0), 0.0)
        nx = -dy * inv * d
        ny = dx * inv * d
        # rectangle per edge, oriented CCW for left-of-travel normals
        rect = np.empty((n, 4, 2))
        rect[:, 0, 0] = r[:, 0] + nx;  rect[:, 0, 1] = r[:, 1] + ny
        rect[:, 1, 0] = r2[:, 0] + nx; rect[:, 1, 1] = r2[:, 1] + ny
        rect[:, 2, 0] = r2[:, 0] - nx; rect[:, 2, 1] = r2[:, 1] - ny
        rect[:, 3, 0] = r[:, 0] - nx;  rect[:, 3, 1] = r[:, 1] - ny
        rect = rect[ok]
        # shoelace per rectangle; flip CW ones
        x = rect[:, :, 0]; y = rect[:, :, 1]
        x2 = np.concatenate((x[:, 1:], x[:, :1]), axis=1)
        y2 = np.concatenate((y[:, 1:], y[:, :1]), axis=1)
        signed = ((x * y2) - (y * x2)).sum(axis=1)
        cw = signed < 0
        if cw.any():
            rect[cw] = rect[cw, ::-1]
        if len(rect):
            caps.append(rect)
        if joins == "all":
            centers = r
        else:
            # turn direction at each vertex: cross(incoming, outgoing)
            prev = np.roll(r, 1, axis=0)
            vin = r - prev
            vout = r2 - r
            cross = vin[:, 0] * vout[:, 1] - vin[:, 1] * vout[:, 0]
            # interior is left of travel: right turns (cross<=0) are the
            # reflex-to-interior corners; left turns stick out exterior
            mask = cross <= 0 if joins == "interior" else cross >= 0
            centers = r[mask]
        if len(centers):
            caps.append(_unit_disk(nseg)[None, :, :] * d + centers[:, None, :])
    return caps


def _ccw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) > 0


def buffer_rings(
    rings: list[np.ndarray], d: float, nseg: int = 32
) -> list[np.ndarray]:
    """Positive (dilate) or negative (erode) buffer; d=0 normalizes.

    Output is simplified at d/20 (far below any observable tolerance) so
    composed morphological stages don't multiply arc vertices.
    """
    if not rings:
        return []
    if d > 0:
        # dilation keeps full vertex disks: exterior-only pruning leaves
        # ~d*SNAP micro-slivers at pruned vertices (measured ~5e-4 m2) —
        # exactness beats the small win outside the hot path
        out = boolean_op(rings, boundary_capsules(rings, d, nseg), "union")
        return simplify_rings(out, abs(d) / 20.0)
    if d < 0:
        return erode_rings(rings, -d, nseg)
    return boolean_op(rings, [], "union")


def erode_rings(
    rings: list[np.ndarray], d: float, nseg: int = 32
) -> list[np.ndarray]:
    if not rings or d <= 0:
        return boolean_op(rings, [], "union") if rings else []
    out = boolean_op(
        rings, boundary_capsules(rings, d, nseg, joins="interior"), "difference"
    )
    return simplify_rings(out, d / 20.0)


def erode_area(rings: list[np.ndarray], d: float, nseg: int = 16) -> float:
    """Area surviving erosion by d — the brdr relevance test, without
    boundary extraction (fast path)."""
    if not rings:
        return 0.0
    return area_of_op(
        rings, boundary_capsules(rings, d, nseg, joins="interior"), "difference"
    )


def open_rings(rings: list[np.ndarray], d: float, nseg: int = 32) -> list[np.ndarray]:
    return buffer_rings(erode_rings(rings, d, nseg), d, nseg)


def close_rings(rings: list[np.ndarray], d: float, nseg: int = 32) -> list[np.ndarray]:
    return erode_rings(buffer_rings(rings, d, nseg), d, nseg)
