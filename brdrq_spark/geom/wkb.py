"""WKB / WKT codecs for the RingSet representation.

Canonical on-wire geometry column is WKB ``BinaryType`` (MultiPolygon);
WKT ``StringType`` at the edges for debuggability — mirrors the
reference's WKT round-trips (plugin/brdrq/brdrq_utils.py:448-479) and
Multi-promotion for layer homogeneity (brdrq_utils.py:935-961). Z/M
ordinates are dropped on decode (brdrq_utils.py:1556-1568).

Pure stdlib ``struct`` — little-endian WKB, geometry types 1-6 plus
Z/M/ZM variants (ordinates beyond x,y discarded).
"""

from __future__ import annotations

import struct

import numpy as np

from brdrq_spark.geom.core import ring_area, snap_ring

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, fmt: str):
        vals = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += struct.calcsize(fmt)
        return vals


def _read_geometry(r: _Reader, rings: list[np.ndarray], lines=None) -> None:
    (byte_order,) = r.read("B")
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = r.read(endian + "I")
    base = gtype % 1000  # 1000/2000/3000 offsets = Z / M / ZM
    extra = {0: 0, 1: 1, 2: 1, 3: 2}[gtype // 1000]
    ndim = 2 + extra
    if base == _WKB_POLYGON:
        (nrings,) = r.read(endian + "I")
        for ri in range(nrings):
            (npts,) = r.read(endian + "I")
            coords = np.asarray(
                r.read(endian + "d" * (npts * ndim)), dtype=np.float64
            ).reshape(npts, ndim)[:, :2]
            ring = snap_ring(coords)
            if len(ring) < 3:
                continue
            a = ring_area(ring)
            # WKB convention-agnostic: force outer CCW, holes CW
            want_ccw = ri == 0
            if (a > 0) != want_ccw and a != 0:
                ring = ring[::-1]
            rings.append(ring)
    elif base == _WKB_MULTIPOLYGON:
        (n,) = r.read(endian + "I")
        for _ in range(n):
            _read_geometry(r, rings, lines)
    elif base == _WKB_POINT:
        pt = r.read(endian + "d" * ndim)[:2]
        if lines is not None:
            lines.append(np.asarray([pt], dtype=np.float64))
    elif base == _WKB_LINESTRING:
        (npts,) = r.read(endian + "I")
        coords = np.asarray(
            r.read(endian + "d" * (npts * ndim)), dtype=np.float64
        ).reshape(npts, ndim)[:, :2]
        if lines is not None and npts > 0:
            lines.append(coords)
    elif base in (_WKB_MULTIPOINT, _WKB_MULTILINESTRING):
        (n,) = r.read(endian + "I")
        for _ in range(n):
            _read_geometry(r, rings, lines)
    else:
        raise ValueError(f"unsupported WKB geometry type {gtype}")


def rings_from_wkb(wkb: bytes | None) -> list[np.ndarray]:
    """Decode WKB (Multi)Polygon to an orientation-encoded ring set."""
    if not wkb:
        return []
    rings: list[np.ndarray] = []
    _read_geometry(_Reader(bytes(wkb)), rings)
    return rings


def lines_from_wkb(wkb: bytes | None) -> list[np.ndarray]:
    """Decode WKB (Multi)LineString/(Multi)Point to (n, 2) polylines
    (points come back as 1-vertex polylines). Z/M dropped — the
    reference's experimental lines/points support (CHANGES.md v0.11.0,
    docs/qa.qmd:13-14)."""
    if not wkb:
        return []
    rings: list[np.ndarray] = []
    lines: list[np.ndarray] = []
    _read_geometry(_Reader(bytes(wkb)), rings, lines)
    return lines


def lines_to_wkb(lines: list[np.ndarray]) -> bytes:
    """Encode polylines as little-endian WKB MultiLineString (1-vertex
    entries encode as a MultiPoint instead when all are points)."""
    lines = [np.asarray(l, dtype=np.float64) for l in lines if len(l) > 0]
    if lines and all(len(l) == 1 for l in lines):
        parts = [struct.pack("<BII", 1, _WKB_MULTIPOINT, len(lines))]
        for l in lines:
            parts.append(struct.pack("<BI", 1, _WKB_POINT))
            parts.append(l[0].astype("<f8").tobytes())
        return b"".join(parts)
    parts = [struct.pack("<BII", 1, _WKB_MULTILINESTRING, len(lines))]
    for l in lines:
        parts.append(struct.pack("<BII", 1, _WKB_LINESTRING, len(l)))
        parts.append(l.astype("<f8").tobytes())
    return b"".join(parts)


def _group_polygons(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Group orientation-encoded rings into [outer, holes...] polygons.

    Holes (CW, negative area) are attached to the smallest containing
    outer ring. Deterministic output order: outers sorted by (minx,
    miny, -area).
    """
    from brdrq_spark.geom.core import point_in_rings

    outers = [(r, ring_area(r)) for r in rings if ring_area(r) > 0]
    holes = [r for r in rings if ring_area(r) < 0]
    outers.sort(key=lambda t: (t[0][:, 0].min(), t[0][:, 1].min(), -t[1]))
    polys: list[list[np.ndarray]] = [[o] for o, _ in outers]
    for h in holes:
        best = None
        best_area = float("inf")
        pt = h[0:1]
        for i, (o, a) in enumerate(outers):
            if a < best_area and point_in_rings(pt, [o]).any():
                best = i
                best_area = a
        if best is not None:
            polys[best].append(h)
    return polys


def rings_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Encode a ring set as little-endian WKB MultiPolygon (Multi-promoted
    for homogeneity, as the reference does — brdrq_utils.py:935-961).
    Empty input encodes as an empty MultiPolygon."""
    polys = _group_polygons(rings)
    parts = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys))]
    for poly in polys:
        parts.append(struct.pack("<BII", 1, _WKB_POLYGON, len(poly)))
        for ring in poly:
            closed = np.vstack([ring, ring[:1]])
            parts.append(struct.pack("<I", len(closed)))
            parts.append(closed.astype("<f8").tobytes())
    return b"".join(parts)


def rings_to_wkt(rings: list[np.ndarray]) -> str:
    polys = _group_polygons(rings)
    if not polys:
        return "MULTIPOLYGON EMPTY"

    def fmt_ring(r):
        pts = ", ".join(f"{x:.6f} {y:.6f}" for x, y in np.vstack([r, r[:1]]))
        return f"({pts})"

    body = ", ".join(
        "(" + ", ".join(fmt_ring(r) for r in poly) + ")" for poly in polys
    )
    return f"MULTIPOLYGON ({body})"


def rings_from_wkt(wkt: str | None) -> list[np.ndarray]:
    """Parse POLYGON / MULTIPOLYGON WKT (2-D; Z/M tokens tolerated)."""
    if not wkt:
        return []
    s = wkt.strip()
    up = s.upper()
    if "EMPTY" in up:
        return []
    if up.startswith("MULTIPOLYGON"):
        depth_target = 3
    elif up.startswith("POLYGON"):
        depth_target = 2
    else:
        raise ValueError(f"unsupported WKT: {s[:40]}")
    body = s[s.index("(") :]
    rings: list[np.ndarray] = []
    depth = 0
    token = []
    ring_pts: list[list[float]] = []
    poly_ring_index = 0
    for ch in body:
        if ch == "(":
            depth += 1
            if depth == depth_target:
                ring_pts = []
            if depth == depth_target - 1:
                poly_ring_index = 0
        elif ch in ",)" and depth == depth_target:
            pt = [float(v) for v in "".join(token).split()]
            if len(pt) >= 2:
                ring_pts.append(pt[:2])
            token = []
            if ch == ")":
                ring = snap_ring(np.asarray(ring_pts, dtype=np.float64))
                if len(ring) >= 3:
                    a = ring_area(ring)
                    want_ccw = poly_ring_index == 0
                    if (a > 0) != want_ccw and a != 0:
                        ring = ring[::-1]
                    rings.append(ring)
                poly_ring_index += 1
                depth -= 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth < depth_target:
            pass
        else:
            token.append(ch)
    return rings
