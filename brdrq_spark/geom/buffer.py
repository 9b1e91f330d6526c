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


_TINY = 1e-6  # m²; the relevance-decision emptiness threshold (align._TINY)
# Certificate safety margin (m / m²). Snap rounding perturbs vertices by
# <= SNAP/sqrt(2) ~ 7e-7 m and can leave O(perimeter*SNAP) ~ 1e-4 m²
# residue in a trapezoid table; 1e-3 dominates both by ~10x, so a
# certificate can only fire where the exact table's decision is the
# same. Anything inside the margin band falls through to the table.
_CERT_MARGIN = 1e-3


def erode_nonempty(rings: list[np.ndarray], d: float, nseg: int = 16) -> bool:
    """Decision-only erosion test: ``erode_area(rings, d, nseg) > _TINY``
    without building a scanbeam table when a cheap certificate settles it.

    The align kernel's full/sliver relevance decisions (the measured hot
    path: ~80% of kernel time was capsule-block trapezoid tables,
    BASELINE.md round-5 census) only consume this boolean, never the
    area. Two rigorous certificates decide ~2/3 of the calls from
    shoelace sums alone; the rest take the exact table:

    * NONEMPTY: the capsules can remove at most
      ``2d*perimeter + n_vertices*pi*d^2`` (each edge rectangle is
      exactly ``2d*len``; each join disk is an inscribed N-gon < pi*d^2,
      and "interior" pruning only drops disks) — if
      ``area - that > _TINY + margin``, something must survive. Valid
      only when the CCW rings are pairwise bbox-disjoint (with margin):
      then the filled area is at least the signed shoelace sum (CW
      rings subtract conservatively in any arrangement), whereas
      stacked CCW rings would let the signed sum overcount winding>=2
      regions and overstate what survives.
    * EMPTY: fires only when EVERY ring is CCW. A survivor point p
      escapes the capsules of each CCW ring containing it, and the
      "interior" pruning covers the full d'-neighborhood of a ring's
      boundary on the polygon-interior side (``d' = d*cos(pi/nseg)``,
      the join N-gon inradius) — so the d'-disk around p sits inside
      that single ring polygon, which then needs ``area >= pi*d'^2``
      and a bbox >= 2d' in both axes. When every CCW ring fails that
      size test, nothing survives; overlapping rings are fine (each
      containing polygon works on its own). Any CW ring disables the
      certificate: "interior" pruning is wrong-sided for a
      free-standing CW region (its polygon-interior reflex wedges are
      uncovered), so ``erode_area`` can keep corner-hugging survivors
      there regardless of the polygon's size.

    Both analytic certificates assume SIMPLE rings (the post-make_valid
    pipeline contract): shoelace sums cannot see self-intersection, so
    a figure-eight ring could defeat either bound. The coarse-table
    prescreen below needs no such assumption (its containment argument
    is set-theoretic on the scanbeam inputs themselves) and picks up
    everything the gated certificates decline.

    Both are margin-guarded against snap rounding (``_CERT_MARGIN``), so
    the boolean is always the one the exact table would produce —
    pinned by the adversarial equivalence sweep in
    tests/test_geom_properties.py.
    """
    if not rings or d <= 0:
        return erode_area(rings, d, nseg) > _TINY
    area = 0.0
    perim = 0.0
    nv = 0
    outers: list[tuple[float, float, float, float, float]] = []
    holes: list[tuple[float, float, float, float, float]] = []
    for ring in rings:
        if ring.ndim != 2 or len(ring) < 3:
            return erode_area(rings, d, nseg) > _TINY
        x = ring[:, 0]
        y = ring[:, 1]
        a = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        dx = np.roll(x, -1) - x
        dy = np.roll(y, -1) - y
        area += a
        perim += float(np.hypot(dx, dy).sum())
        nv += len(ring)
        box = (float(x.min()), float(y.min()), float(x.max()), float(y.max()), a)
        if a > 0:  # CCW
            outers.append(box)
        else:
            holes.append(box)
    def _pairwise_disjoint(
        boxes: list[tuple[float, float, float, float, float]],
    ) -> bool:
        return all(
            (
                bi[2] < bj[0] - _CERT_MARGIN
                or bj[2] < bi[0] - _CERT_MARGIN
                or bi[3] < bj[1] - _CERT_MARGIN
                or bj[3] < bi[1] - _CERT_MARGIN
            )
            for i, bi in enumerate(boxes)
            for bj in boxes[i + 1 :]
        )

    # NONEMPTY certificate: removal upper bound can't reach the area.
    # Gated on disjoint CCW rings so the signed sum is a lower bound
    # on the NONZERO-filled area (see docstring); CW rings subtract
    # their full polygon area, conservative in any arrangement. The
    # arithmetic test runs first so the pairwise loop only executes
    # on prospective firings.
    if (area - 2.0 * d * perim - nv * np.pi * d * d > _TINY + _CERT_MARGIN) and (
        len(outers) <= 1 or _pairwise_disjoint(outers)
    ):
        return True
    # EMPTY certificate: all-CCW inputs only (see docstring — a CW
    # ring, nested hole or free-standing region alike, routes to the
    # coarse prescreen instead). Overlapping CCW rings are fine, so
    # no disjointness condition here.
    if not holes:
        dp = d * float(np.cos(np.pi / nseg))
        fits = any(
            min(b[2] - b[0], b[3] - b[1]) >= 2.0 * dp - _CERT_MARGIN
            and b[4] >= np.pi * dp * dp - _CERT_MARGIN
            for b in outers
        )
        if not fits:
            return False
    # Coarse-table EMPTY prescreen for the shapes the analytic
    # certificates are blind to (bent thin bands whose bbox is large in
    # every direction).  ``_unit_disk(4)`` vertices sit at angles
    # 0/90/180/270 — a phase-aligned subset of every ``_unit_disk(4k)``
    # — so by convexity the 4-gon disk of radius d-μ is contained in the
    # nseg-gon disk of radius d, and each edge rectangle of half-width
    # d-μ is contained in the one of half-width d.  Hence
    # ``capsules(d-μ, 4) ⊆ capsules(d, nseg)`` pointwise for ANY input
    # (no simplicity or orientation assumption — the containment is set
    # theoretic and both sides fill by the same NONZERO winding), and
    # erosion by the coarse capsules is a superset of the exact erosion:
    # a (near-)empty coarse table certifies the exact table empty.  The
    # μ = _CERT_MARGIN radius back-off makes the containment gap
    # (≥ μ·cos(π/4) ≈ 7e-4 m, the rectangle half-width delta) dominate
    # snap rounding (≤ 7e-7 m): any exact-table survivor sliver of area
    # > _TINY implies a free disk of radius ~μ·cos(π/4) in the coarse
    # arrangement, i.e. coarse area ≥ π(7e-4)² ≈ 1.5e-6 — so a coarse
    # reading ≤ 1e-9 can only occur where the exact table reads empty.
    # Measured on the bench workload (scripts/_probe_cert_fallbacks.py):
    # every fallthrough call fires the prescreen (all are EMPTY bands),
    # so there is no double-build penalty; the net win is modest there
    # (the median fallback ring has ~6 vertices and the table cost is
    # numpy fixed overhead, not vertex count) but the largest fallback
    # tables (>256 capsule vertices) halve, which is what matters for
    # vertex-dense inputs.  A tighter analytic NONEMPTY bound
    # (d*perim instead of 2d*perim, valid for certified-simple rings)
    # was probed and rejected: it fires zero times on this workload —
    # the fallbacks are EMPTY-side, not threshold-band NONEMPTY.
    if nseg % 4 == 0 and nseg > 4 and d > 2.0 * _CERT_MARGIN:
        if erode_area(rings, d - _CERT_MARGIN, 4) <= 1e-9:
            return False
    return erode_area(rings, d, nseg) > _TINY


def open_rings(rings: list[np.ndarray], d: float, nseg: int = 32) -> list[np.ndarray]:
    return buffer_rings(erode_rings(rings, d, nseg), d, nseg)


def close_rings(rings: list[np.ndarray], d: float, nseg: int = 32) -> list[np.ndarray]:
    return erode_rings(buffer_rings(rings, d, nseg), d, nseg)
