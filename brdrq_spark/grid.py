"""Hierarchical Morton (Z-order) cell index over a projected meter CRS.

The H3/S2 equivalent mandated by the build (BASELINE.json north_rule),
built from scratch. Replaces the reference's filter-and-refine spatial
pruning (buffered-extent semi-join, plugin/brdrq/brdrq_utils.py:1569-1590;
bbox filter, plugin/brdrq/brdrq_dockwidget_featurealigner.py:1653-1667)
with an exact, deterministic, bit-for-bit-testable cell cover:

* resolution ``r`` (0..15) → square cells of edge ``2**(15-r)`` meters
  (32768 m at r0 down to 1 m at r15),
* cell id: int64 ``(res << 58) | morton(ix, iy)`` where ix, iy are
  biased column/row indices (bias 2**22 m keeps negatives addressable),
* ``cell_cover`` returns the sorted cells overlapping a bbox (optionally
  dilated) — candidate generation is then a plain equi-join on cell id,
  which Catalyst plans as broadcast or shuffle hash join.

All functions are NumPy-vectorized so they run inside Arrow-batched
pandas UDFs with no per-row Python.
"""

from __future__ import annotations

import numpy as np

RES_MAX = 15
_BIAS = float(2**22)  # meters; supports coords in (-4.2e6, +4.2e6)
_RES_SHIFT = 58


def cell_size(res: int) -> float:
    """Cell edge length in meters at resolution ``res``."""
    if not 0 <= res <= RES_MAX:
        raise ValueError(f"resolution {res} outside [0, {RES_MAX}]")
    return float(2 ** (RES_MAX - res))


def pick_resolution(relevant_distance: float, typical_extent: float = 32.0) -> int:
    """Finest resolution whose cell edge still covers the search dilation.

    Candidate cells must be at least ~2x the dilated search radius so a
    dilated geometry covers O(extent/cell)^2 cells, not hundreds. Mirrors
    the reference's adaptive coarsening idea
    (plugin/brdrq/brdrq_dockwidget_featurealigner.py:1272-1299).
    """
    need = max(4.0 * max(relevant_distance, 0.01), typical_extent)
    res = RES_MAX - int(np.ceil(np.log2(need)))
    return int(np.clip(res, 0, RES_MAX))


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of v so there is a zero bit between each."""
    v = v.astype(np.uint64)
    v &= np.uint64(0x1FFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton2(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Interleave two index arrays into Z-order keys (uint64)."""
    return _part1by1(ix) | (_part1by1(iy) << np.uint64(1))


def cell_id(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Pack (res, ix, iy) into int64 cell ids."""
    m = morton2(np.asarray(ix, dtype=np.uint64), np.asarray(iy, dtype=np.uint64))
    return (m | (np.uint64(res) << np.uint64(_RES_SHIFT))).astype(np.int64)


def cell_of_points(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Cell id containing each (x, y) point; vectorized."""
    cs = cell_size(res)
    ix = np.floor((np.asarray(x, dtype=np.float64) + _BIAS) / cs).astype(np.uint64)
    iy = np.floor((np.asarray(y, dtype=np.float64) + _BIAS) / cs).astype(np.uint64)
    return cell_id(ix, iy, res)


def cover_ranges(minx, miny, maxx, maxy, res: int, dilate: float = 0.0):
    """Vectorized cell-index ranges of (dilated) bboxes: int64 arrays
    (ix0, iy0, nx, ny). The SINGLE owner of the cover arithmetic —
    both the scalar ``cell_cover_bbox`` and the batch explode path
    (candidates.cells_exploded) derive from it, so the bias/floor math
    cannot silently diverge between the two join sides.

    Non-finite coordinates raise (a NaN would otherwise flow through
    ``astype(int64)`` as INT64_MIN and join a garbage Morton cell —
    wrong output beats no output only in the other direction)."""
    cs = cell_size(res)
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    finite = (
        np.isfinite(minx) & np.isfinite(miny) & np.isfinite(maxx) & np.isfinite(maxy)
    )
    if not finite.all():
        raise ValueError(
            f"cover_ranges: {int((~finite).sum())} bbox(es) with non-finite "
            f"coordinates (corrupt geometry upstream)"
        )
    ix0 = np.floor((minx - dilate + _BIAS) / cs).astype(np.int64)
    ix1 = np.floor((maxx + dilate + _BIAS) / cs).astype(np.int64)
    iy0 = np.floor((miny - dilate + _BIAS) / cs).astype(np.int64)
    iy1 = np.floor((maxy + dilate + _BIAS) / cs).astype(np.int64)
    return ix0, iy0, ix1 - ix0 + 1, iy1 - iy0 + 1


def cell_cover_bbox(
    minx: float, miny: float, maxx: float, maxy: float, res: int, dilate: float = 0.0
) -> np.ndarray:
    """Sorted int64 ids of all cells overlapping the (dilated) bbox."""
    if maxx < minx or maxy < miny:
        return np.zeros(0, dtype=np.int64)
    ix0, iy0, nx, ny = cover_ranges(minx, miny, maxx, maxy, res, dilate)
    ix = np.arange(int(ix0), int(ix0) + int(nx), dtype=np.uint64)
    iy = np.arange(int(iy0), int(iy0) + int(ny), dtype=np.uint64)
    gx, gy = np.meshgrid(ix, iy)
    out = cell_id(gx.ravel(), gy.ravel(), res)
    out.sort()
    return out


def cell_bounds(cid: int) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of a cell id (inverse of cell_id)."""
    c = np.uint64(cid)
    res = int(c >> np.uint64(_RES_SHIFT))
    m = c & ((np.uint64(1) << np.uint64(_RES_SHIFT)) - np.uint64(1))
    ix = _compact1by1(m)
    iy = _compact1by1(m >> np.uint64(1))
    cs = cell_size(res)
    minx = float(ix) * cs - _BIAS
    miny = float(iy) * cs - _BIAS
    return (minx, miny, minx + cs, miny + cs)


def _compact1by1(v: np.uint64) -> np.uint64:
    v &= np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x1FFFFFFF)
    return v
