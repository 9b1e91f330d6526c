"""Bit-for-bit tests of the Morton cell index (SURVEY.md §7.1 M2)."""

import numpy as np
import pytest

from brdrq_spark.grid import (
    cell_bounds,
    cell_cover_bbox,
    cell_id,
    cell_of_points,
    cell_size,
    cover_ranges,
    morton2,
    pick_resolution,
)


def naive_morton(ix: int, iy: int) -> int:
    out = 0
    for b in range(29):
        out |= ((ix >> b) & 1) << (2 * b)
        out |= ((iy >> b) & 1) << (2 * b + 1)
    return out


def test_morton_matches_naive():
    rng = np.random.default_rng(7)
    ix = rng.integers(0, 2**23, 200).astype(np.uint64)
    iy = rng.integers(0, 2**23, 200).astype(np.uint64)
    fast = morton2(ix, iy)
    for a, b, m in zip(ix, iy, fast):
        assert naive_morton(int(a), int(b)) == int(m)


def test_cell_id_is_res_disjoint_and_sortable():
    ids_r5 = cell_id(np.array([1, 2]), np.array([3, 4]), 5)
    ids_r6 = cell_id(np.array([1, 2]), np.array([3, 4]), 6)
    assert len(set(ids_r5) & set(ids_r6)) == 0
    assert all(i > 0 for i in ids_r5)  # res in high bits keeps int64 positive


def test_cell_of_points_and_bounds_roundtrip():
    xs = np.array([0.0, 100.5, -2000.25, 174158.0])
    ys = np.array([0.0, -100.5, 31337.0, 179374.0])
    for res in (0, 7, 12, 15):
        cids = cell_of_points(xs, ys, res)
        for x, y, cid in zip(xs, ys, cids):
            minx, miny, maxx, maxy = cell_bounds(int(cid))
            assert minx <= x < maxx
            assert miny <= y < maxy
            assert maxx - minx == pytest.approx(cell_size(res))


def test_cover_bbox_counts_and_determinism():
    res = 10  # 32 m cells
    cover = cell_cover_bbox(0.0, 0.0, 100.0, 100.0, res)
    # 100m span crosses ceil boundaries: 4x4 = 16 cells starting at 0
    assert len(cover) == 16
    assert list(cover) == sorted(cover)
    again = cell_cover_bbox(0.0, 0.0, 100.0, 100.0, res)
    assert np.array_equal(cover, again)
    # dilation adds a ring
    dil = cell_cover_bbox(0.0, 0.0, 100.0, 100.0, res, dilate=32.0)
    assert len(dil) == 36
    assert set(cover) <= set(dil)


def test_point_cell_membership_in_cover():
    res = 9
    cover = set(cell_cover_bbox(500.0, 600.0, 700.0, 800.0, res))
    pts_x = np.linspace(500, 699.9, 13)
    pts_y = np.linspace(600, 799.9, 13)
    assert set(cell_of_points(pts_x, pts_y, res)) <= cover


def test_pick_resolution_monotone():
    rs = [pick_resolution(rd) for rd in (0.1, 1, 2, 5, 10, 50, 200)]
    assert rs == sorted(rs, reverse=True)
    assert cell_size(pick_resolution(2.0)) >= 4 * 2.0
    assert 0 <= min(rs) and max(rs) <= 15


def test_cells_exploded_matches_per_row_cover(spark):
    """The batch-vectorized cover/assembly in cells_exploded must emit
    exactly the multiset of (id, cell, bbox) rows the per-row
    cell_cover_bbox path produces — including the inline-budget NULLing
    of oversized WKB and outer rows for empty geometries."""
    import pandas as pd

    from brdrq_spark.geom import bbox as gbbox, rings_from_wkb, rings_to_wkb
    from brdrq_spark.operators.candidates import cells_exploded
    from brdrq_spark.sources.synthetic import thematic_polygons

    th = thematic_polygons(64, 8, 8, seed=11, jitter=1.0)
    # append an empty-geometry row to exercise the outer path
    th = pd.concat(
        [th, pd.DataFrame([{"theme_id": "empty", "geom_wkb": rings_to_wkb([])}])],
        ignore_index=True,
    )
    df = spark.createDataFrame(th[["theme_id", "geom_wkb"]])
    res, dilate = 10, 4.04
    got = cells_exploded(
        df, "theme_id", res, dilate, "t", wkb_out="theme_wkb",
        inline_budget=9 * 200, outer=True,
    ).collect()

    exp = []
    for _, r in th.iterrows():
        rings = rings_from_wkb(r.geom_wkb)
        if not rings:
            exp.append((r.theme_id, None, None, None))
            continue
        mnx, mny, mxx, mxy = gbbox(rings)
        cells = cell_cover_bbox(mnx, mny, mxx, mxy, res, dilate)
        ship = r.geom_wkb if len(cells) * len(r.geom_wkb) <= 9 * 200 else None
        for c in cells:
            exp.append((r.theme_id, int(c), round(mnx, 9), ship is not None))
    got_t = sorted(
        (
            r.theme_id,
            int(r.cell) if r.cell is not None else None,
            round(r.t_minx, 9) if r.t_minx is not None else None,
            r.theme_wkb is not None if r.cell is not None else None,
        )
        for r in got
    )
    assert got_t == sorted(exp)
    assert ("empty", None, None, None) in got_t


def test_cover_ranges_shared_and_loud_on_nan():
    """cover_ranges is the single owner of the cover arithmetic: the
    scalar cell_cover_bbox derives from it, and non-finite bboxes raise
    instead of flowing through astype(int64) as INT64_MIN garbage."""
    ix0, iy0, nx, ny = cover_ranges(0.0, 0.0, 100.0, 100.0, 10)
    assert int(nx) * int(ny) == len(cell_cover_bbox(0.0, 0.0, 100.0, 100.0, 10))
    with pytest.raises(ValueError, match="non-finite"):
        cover_ranges(np.array([0.0, np.nan]), np.array([0.0, 0.0]),
                     np.array([1.0, 1.0]), np.array([1.0, 1.0]), 10)
