"""Raster→vector footprint extraction (BASELINE.json north_star: thematic
polygons derived per image from the image+caption table).

Pipeline per image: decode → threshold mask → per-row run-length
rectangles → exact union via the scanbeam boolean engine (shared edges
between row rectangles cancel, yielding the pixel-accurate boundary —
equivalent to marching squares on a binary mask) → affine placement into
the shared projected CRS, deterministically seeded by ``phash``.

Runs inside Arrow-batched pandas UDFs; NumPy throughout, no per-row
Python at the Spark row level (input_hint requirement).
"""

from __future__ import annotations

import numpy as np

from brdrq_spark.geom.clip import boolean_op
from brdrq_spark.raster.png import decode_image

# Deterministic placement domain: a synthetic "municipality" square in a
# meter CRS, sized so footprints land on the synthetic reference parcels.
PLACEMENT_ORIGIN = (170000.0, 170000.0)
PLACEMENT_SPAN = 4096.0


def mask_to_rings(mask: np.ndarray) -> list[np.ndarray]:
    """Exact polygon boundary of a binary mask (pixel frame, y-up).

    Each row's filled runs become unit-height rectangles; their union's
    shared edges cancel in the boolean engine, leaving the outline
    (holes included, correctly oriented).
    """
    mask = np.asarray(mask, dtype=bool)
    h, w = mask.shape
    rects: list[np.ndarray] = []
    for r in range(h):
        row = mask[r]
        if not row.any():
            continue
        padded = np.concatenate(([False], row, [False]))
        d = np.diff(padded.astype(np.int8))
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0]
        y0 = float(h - 1 - r)  # image row 0 at top → y-up frame
        for s, e in zip(starts, ends):
            rects.append(
                np.array(
                    [[s, y0], [e, y0], [e, y0 + 1.0], [s, y0 + 1.0]], dtype=np.float64
                )
            )
    if not rects:
        return []
    return boolean_op(rects, [], "union")


def place_rings(
    rings: list[np.ndarray], phash: int, w: int, h: int, target_extent: float = 40.0
) -> list[np.ndarray]:
    """Deterministically place a pixel-frame footprint into the CRS.

    The placement cell is derived from the low bits of ``phash`` (the
    table's deterministic content hash — FIXTURES.md §3), scaling the
    longer image side to ``target_extent`` meters.
    """
    if not rings:
        return []
    scale = target_extent / float(max(w, h))
    hv = phash & 0xFFFFFFFF
    gx = (hv & 0xFFFF) % 64
    gy = ((hv >> 16) & 0xFFFF) % 64
    step = PLACEMENT_SPAN / 64.0
    tx = PLACEMENT_ORIGIN[0] + gx * step
    ty = PLACEMENT_ORIGIN[1] + gy * step
    return [r * scale + np.array([tx, ty]) for r in rings]


def extract_footprint(
    data: bytes, w: int, h: int, fmt: str, phash: int, threshold: int = 128
) -> list[np.ndarray]:
    """decode → threshold → outline → CRS placement. Returns a RingSet."""
    img = decode_image(data, w, h, fmt)
    return footprint_from_pixels(img, w, h, phash, threshold)


def footprint_from_pixels(
    img: np.ndarray, w: int, h: int, phash: int, threshold: int = 128
) -> list[np.ndarray]:
    """The post-decode half of ``extract_footprint``: callers that also
    need the raw pixels (e.g. the pixel-content hash) decode ONCE and
    feed both consumers instead of paying the image decode twice."""
    return place_rings(mask_to_rings(img >= threshold), phash, w, h)
