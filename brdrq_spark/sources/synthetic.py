"""Deterministic synthetic tables mirroring the reference fixtures
(FIXTURES.md; reference test fixtures plugin/brdrq/test/*.geojson) and the
driver-mandated image+caption table (BASELINE.json input_hint).

Everything is seeded — same args, same bytes — so tile assignments and
join outputs are reproducible bit-for-bit across runs and parallelism
levels. The sandbox replaces the reference's remote loaders
(GRBActualLoader etc., plugin/brdrq/brdrq_algorithm_autocorrectborders.py:
578-604) with these generators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from brdrq_spark.geom import point_in_rings, ring_area, rings_perimeter, rings_to_wkb
from brdrq_spark.raster.png import encode_image

# Shared placement domain with raster.footprint: parcels tile the square
# (170000,170000)..(174096,174096); 64 m parcel pitch, 64x64 grid.
GRID_ORIGIN = (170000.0, 170000.0)
PARCEL_PITCH = 64.0


def _nodes(nx: int, ny: int, seed: int, perturb: float = 0.22) -> np.ndarray:
    """Perturbed lattice nodes (nx+1, ny+1, 2); border nodes fixed so the
    tessellation tiles its bbox exactly; interior nodes jittered — shared
    edges stay exactly shared (degeneracy-rich on purpose, FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    gx = GRID_ORIGIN[0] + np.arange(nx + 1) * PARCEL_PITCH
    gy = GRID_ORIGIN[1] + np.arange(ny + 1) * PARCEL_PITCH
    nodes = np.stack(np.meshgrid(gx, gy, indexing="ij"), axis=-1)
    jit = rng.uniform(-perturb * PARCEL_PITCH, perturb * PARCEL_PITCH, nodes.shape)
    jit[0, :, :] = 0
    jit[-1, :, :] = 0
    jit[:, 0, :] = 0
    jit[:, -1, :] = 0
    return np.round(nodes + jit, 3)


def _parcel_ring(nodes: np.ndarray, i: int, j: int) -> np.ndarray:
    return np.array(
        [nodes[i, j], nodes[i + 1, j], nodes[i + 1, j + 1], nodes[i, j + 1]],
        dtype=np.float64,
    )


def reference_parcels(nx: int = 64, ny: int = 64, seed: int = 42) -> pd.DataFrame:
    """Cadastral-like reference border layer: (nx*ny) edge-sharing quads.

    Schema mirrors the reference fixture referencelayer_test.geojson
    (FIXTURES.md §2): ref_id, geom_wkb, OIDN, VERSIE, BEGINDATUM,
    VERSDATUM, NISCODE, LENGTE, OPPERVL.
    """
    nodes = _nodes(nx, ny, seed)
    rows = []
    oidn = 0
    for i in range(nx):
        for j in range(ny):
            ring = _parcel_ring(nodes, i, j)
            nis = f"{44000 + (i // 16) * 8 + (j // 16):05d}"
            oidn += 1
            rows.append(
                {
                    "ref_id": f"{nis}P{i:04d}C{j:04d}",
                    "geom_wkb": rings_to_wkb([ring]),
                    "OIDN": oidn,
                    "VERSIE": 1,
                    "BEGINDATUM": "2023-01-01",
                    "VERSDATUM": "2023-01-01",
                    "NISCODE": nis,
                    "LENGTE": round(rings_perimeter([ring]), 3),
                    "OPPERVL": round(ring_area(ring), 3),
                }
            )
    return pd.DataFrame(rows)


def reference_parcels_v2(
    nx: int = 64, ny: int = 64, seed: int = 42, change_frac: float = 0.05
) -> pd.DataFrame:
    """Updated reference: ~change_frac of interior nodes re-perturbed;
    every parcel touching a moved node gets VERSIE=2 and a new VERSDATUM —
    drives the temporal-update operator (reference analogue:
    plugin/brdrq/brdrq_algorithm_autoupdateborders.py:431-450)."""
    nodes = _nodes(nx, ny, seed)
    rng = np.random.default_rng(seed + 1)
    moved = np.zeros((nx + 1, ny + 1), dtype=bool)
    n_move = max(1, int(change_frac * (nx - 1) * (ny - 1)))
    for _ in range(n_move):
        i = int(rng.integers(1, nx))
        j = int(rng.integers(1, ny))
        nodes[i, j] += np.round(rng.uniform(-8.0, 8.0, 2), 3)
        moved[i, j] = True
    base = reference_parcels(nx, ny, seed)
    recs = base.to_dict("records")
    k = 0
    for i in range(nx):
        for j in range(ny):
            rec = recs[k]
            k += 1
            if moved[i : i + 2, j : j + 2].any():
                ring = _parcel_ring(nodes, i, j)
                rec["geom_wkb"] = rings_to_wkb([ring])
                rec["VERSIE"] = 2
                rec["VERSDATUM"] = "2024-06-01"
                rec["LENGTE"] = round(rings_perimeter([ring]), 3)
                rec["OPPERVL"] = round(ring_area(ring), 3)
    return pd.DataFrame(recs)


def thematic_polygons(
    n: int = 50,
    nx: int = 64,
    ny: int = 64,
    seed: int = 42,
    jitter: float = 1.5,
    node_seed: int | None = None,
) -> pd.DataFrame:
    """Thematic layer: n parcels re-drawn with vertex jitter of ±jitter m
    (alignment at rd >= 2*jitter should snap them back — mirrors the
    fixture themelayer_test.geojson, 0-3 m off the cadastral grid,
    FIXTURES.md §1). ``node_seed`` pins the underlying tessellation
    independently of the jitter seed — pass the reference layer's seed
    when generating extra jittered copies of the SAME grid (a different
    node seed produces a mismatched tessellation whose themes straddle
    many parcels: ~5x more partial-branch kernel work)."""
    nodes = _nodes(nx, ny, seed if node_seed is None else node_seed)
    rng = np.random.default_rng(seed + 2)
    cells = rng.choice(nx * ny, size=n, replace=False)
    rows = []
    for t, c in enumerate(sorted(cells)):
        i, j = int(c) // ny, int(c) % ny
        ring = _parcel_ring(nodes, i, j).copy()
        ring += rng.uniform(-jitter, jitter, ring.shape)
        ring = np.round(ring, 3)
        rows.append(
            {
                "theme_id": f"theme_{t:05d}",
                "geom_wkb": rings_to_wkb([ring]),
                "dossierstatus": ["open", "review", "closed"][t % 3],
                "src_parcel": f"P{i:04d}C{j:04d}",
            }
        )
    return pd.DataFrame(rows)


def _polygon_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Grayscale image: bright filled convex-ish blob on dark noise."""
    k = int(rng.integers(5, 10))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rad = rng.uniform(0.25, 0.48, k) * min(w, h)
    cx, cy = w / 2.0, h / 2.0
    poly = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    ys, xs = np.mgrid[0:h, 0:w]
    pts = np.column_stack([xs.ravel() + 0.5, (h - 1 - ys.ravel()) + 0.5])
    inside = point_in_rings(pts, [poly]).reshape(h, w)
    img = rng.integers(0, 60, (h, w)).astype(np.uint8)
    img[inside] = rng.integers(180, 250)
    return img


def _phash64(img: np.ndarray) -> int:
    """Deterministic 64-bit perceptual hash: 8x8 mean-threshold signature."""
    h, w = img.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    blocks = np.add.reduceat(np.add.reduceat(img.astype(np.int64), ys, axis=0), xs, axis=1)
    bits = (blocks > blocks.mean()).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def rect_images_table(n: int = 24, lossy_every: int = 5) -> pd.DataFrame:
    """Closed-form image fixture: 40x40 images whose mask is a single
    rectangle of rw x rh = (4 + i%7) x (3 + i%5) pixels at offset (2, 2).
    With the 40 m placement extent the pixel scale is exactly 1, so the
    extracted footprint area is exactly rw*rh m² — relationally
    derivable (the footprint_extraction oracle). Quantization (every
    ``lossy_every``-th image) maps 255 -> 252 and 0 -> 0, both on the
    same side of the 128 threshold, so the mask (and area) is invariant
    across the lossy branch."""
    rows = []
    for i in range(n):
        w = h = 40
        rw, rh = 4 + i % 7, 3 + i % 5
        img = np.zeros((h, w), dtype=np.uint8)
        img[2 : 2 + rh, 2 : 2 + rw] = 255
        fmt = "png" if i % 2 == 0 else "raw"
        quant = 4 if (lossy_every and i % lossy_every == 0) else 1
        rows.append(
            {
                "image_id": f"rect_{i:04d}",
                "bytes": encode_image(img, fmt, quantize=quant),
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                "caption": f"rect {rw}x{rh} image {i}",
                "phash": np.int64(_phash64(img)),
            }
        )
    return pd.DataFrame(rows)


def images_table(n: int = 100, seed: int = 42, lossy_every: int = 5) -> pd.DataFrame:
    """The driver-mandated Iceberg-style image+caption table
    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64) — BASELINE.json input_hint, exact shape.

    Every ``lossy_every``-th image is quantized (PSNR >= 40 dB branch of
    the per-row invariant); fmt alternates png/raw.
    """
    rng = np.random.default_rng(seed + 3)
    rows = []
    for i in range(n):
        w = int(rng.integers(24, 96))
        h = int(rng.integers(24, 96))
        img = _polygon_image(rng, w, h)
        fmt = "png" if i % 2 == 0 else "raw"
        quant = 4 if (lossy_every and i % lossy_every == 0) else 1
        data = encode_image(img, fmt, quantize=quant)
        rows.append(
            {
                "image_id": f"img_{seed:04d}_{i:06d}",
                "bytes": data,
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                "caption": f"synthetic footprint {i} of seed {seed}",
                "phash": np.int64(_phash64(img)),
            }
        )
    return pd.DataFrame(rows)
