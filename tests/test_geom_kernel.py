"""Unit tests for the from-scratch geometry kernel (SURVEY.md §7.1 M1).

Hand-computed expectations; tolerances reflect the snap grid (1e-6 m)
and disk discretization, all far below the engine correction_distance
(0.01 m, reference plugin/brdrq/brdrq_algorithm_autocorrectborders.py:193).
"""

import numpy as np
import pytest

from brdrq_spark.geom import (
    bbox,
    bbox_distance,
    boolean_op,
    buffer_rings,
    erode_rings,
    min_distance,
    normalize,
    point_in_rings,
    ring_area,
    rings_area,
    rings_from_wkb,
    rings_from_wkt,
    rings_perimeter,
    rings_to_wkb,
    rings_to_wkt,
)
from brdrq_spark.geom.buffer import erode_area
from brdrq_spark.geom.clip import area_of_op


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float)


def test_shoelace_and_perimeter():
    r = sq(0, 0, 10)
    assert ring_area(r) == pytest.approx(100.0)
    assert ring_area(r[::-1]) == pytest.approx(-100.0)
    assert rings_perimeter([r]) == pytest.approx(40.0)


def test_point_in_rings_with_hole():
    outer = sq(0, 0, 10)
    hole = sq(4, 4, 2)[::-1]  # CW hole
    geom = [outer, hole]
    pts = np.array([[1, 1], [5, 5], [11, 5], [4.5, 3.0]])
    assert list(point_in_rings(pts, geom)) == [True, False, False, True]


def test_intersection_of_overlapping_squares():
    a = [sq(0, 0, 10)]
    b = [sq(5, 5, 10)]
    out = boolean_op(a, b, "intersection")
    assert rings_area(out) == pytest.approx(25.0, abs=1e-6)
    # boundary is the 5x5 square
    assert rings_perimeter(out) == pytest.approx(20.0, abs=1e-5)


def test_union_difference_symdiff():
    a = [sq(0, 0, 10)]
    b = [sq(5, 5, 10)]
    assert rings_area(boolean_op(a, b, "union")) == pytest.approx(175.0, abs=1e-6)
    assert rings_area(boolean_op(a, b, "difference")) == pytest.approx(75.0, abs=1e-6)
    assert rings_area(boolean_op(a, b, "symdiff")) == pytest.approx(150.0, abs=1e-6)


def test_disjoint_and_nested():
    a = [sq(0, 0, 4)]
    b = [sq(10, 10, 4)]
    assert boolean_op(a, b, "intersection") == []
    assert rings_area(boolean_op(a, b, "union")) == pytest.approx(32.0, abs=1e-6)
    inner = [sq(2, 2, 2)]
    outer = [sq(0, 0, 10)]
    assert rings_area(boolean_op(outer, inner, "intersection")) == pytest.approx(4.0, abs=1e-6)
    d = boolean_op(outer, inner, "difference")
    assert rings_area(d) == pytest.approx(96.0, abs=1e-6)
    # difference produced a hole: 2 rings, one negative
    areas = sorted(ring_area(r) for r in d)
    assert areas[0] == pytest.approx(-4.0, abs=1e-6)
    assert areas[1] == pytest.approx(100.0, abs=1e-6)


def test_shared_edge_union():
    # cadastral-style: exact shared edge, no overlap
    a = [sq(0, 0, 10)]
    b = [sq(10, 0, 10)]
    u = boolean_op(a, b, "union")
    assert rings_area(u) == pytest.approx(200.0, abs=1e-6)
    assert rings_perimeter(u) == pytest.approx(60.0, abs=1e-4)  # internal edge gone
    assert rings_area(boolean_op(a, b, "intersection")) == pytest.approx(0.0, abs=1e-6)


def test_triangle_intersection():
    tri = [np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])]
    box = [sq(0, 0, 5)]
    out = boolean_op(tri, box, "intersection")
    # triangle cut by 5x5 box: area = 25 - 0 ... region x<=5,y<=5,x+y<=10 => 25 - 0 = 22.5? compute: box area 25 minus corner triangle above line x+y=10 clipped.. line enters box at (5,5): only point => area 25 intersect halfplane x+y<=10 => 25 - 0 = 25 - area{x+y>10 in box}=25-0=... (5,5) on line so 25.
    # Actually x+y <= 10 contains the whole 5x5 box (max 10 on corner)
    assert rings_area(out) == pytest.approx(25.0, abs=1e-5)
    box2 = [sq(2, 2, 10)]
    out2 = boolean_op(tri, box2, "intersection")
    # region: x>=2, y>=2, x+y<=10 → triangle with legs 6 → area 18
    assert rings_area(out2) == pytest.approx(18.0, abs=1e-5)


def test_normalize_self_intersecting_bowtie():
    bow = [np.array([[0.0, 0.0], [10.0, 10.0], [10.0, 0.0], [0.0, 10.0]])]
    out = normalize(bow)
    # nonzero winding keeps both lobes: two triangles, each area 25
    assert rings_area(out) == pytest.approx(50.0, abs=1e-4)
    assert len(out) == 2


def test_multi_ring_union_many():
    tiles = [sq(i * 2.0, 0.0, 2.0) for i in range(5)]
    u = boolean_op(tiles, [], "union")
    assert rings_area(u) == pytest.approx(20.0, abs=1e-6)
    assert rings_perimeter(u) == pytest.approx(24.0, abs=1e-4)


def test_buffer_square_area():
    a = [sq(0, 0, 10)]
    out = buffer_rings(a, 1.0)
    # exact = 100 + 4*10*1 + pi*1^2; k-gon disks slightly under pi
    expect = 100 + 40 + np.pi
    assert rings_area(out) == pytest.approx(expect, rel=0.01)


def test_erode_square():
    a = [sq(0, 0, 10)]
    out = erode_rings(a, 1.0)
    assert rings_area(out) == pytest.approx(64.0, abs=0.2)  # 8x8
    # erosion kills thin slivers entirely
    sliver = [np.array([[0, 0], [100, 0], [100, 0.5], [0, 0.5]], float)]
    assert erode_area(sliver, 1.0) == pytest.approx(0.0, abs=1e-6)
    assert erode_area(a, 1.0) > 50


def test_area_of_op_matches_boolean_op():
    a = [sq(0, 0, 10)]
    b = [sq(3, -2, 9)]
    for op in ("union", "intersection", "difference", "symdiff"):
        assert area_of_op(a, b, op) == pytest.approx(
            rings_area(boolean_op(a, b, op)), abs=1e-6
        )


def test_wkb_roundtrip():
    geom = [sq(0, 0, 10), sq(4, 4, 2)[::-1]]  # square with hole
    wkb = rings_to_wkb(geom)
    back = rings_from_wkb(wkb)
    assert rings_area(back) == pytest.approx(96.0, abs=1e-6)
    assert len(back) == 2
    # empty
    assert rings_from_wkb(rings_to_wkb([])) == []


def test_wkt_roundtrip():
    wkt = "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4)))"
    rings = rings_from_wkt(wkt)
    assert rings_area(rings) == pytest.approx(96.0, abs=1e-6)
    again = rings_from_wkt(rings_to_wkt(rings))
    assert rings_area(again) == pytest.approx(96.0, abs=1e-6)
    # POLYGON form
    assert rings_area(rings_from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")) == pytest.approx(4.0)


def test_min_distance_and_bbox():
    a = [sq(0, 0, 2)]
    b = [sq(5, 0, 2)]
    assert min_distance(a, b) == pytest.approx(3.0, abs=1e-9)
    assert min_distance(a, [sq(1, 1, 5)]) == 0.0
    assert min_distance(a, [sq(0.5, 0.5, 1)]) == 0.0  # containment
    bb = bbox(a)
    assert bb == (0.0, 0.0, 2.0, 2.0)
    assert bbox_distance(bb, bbox(b)) == pytest.approx(3.0)


def test_degenerate_inputs():
    # collinear + duplicate points survive normalize
    messy = [np.array([[0, 0], [5, 0], [10, 0], [10, 10], [10, 10], [0, 10]], float)]
    out = normalize(messy)
    assert rings_area(out) == pytest.approx(100.0, abs=1e-6)
    # zero-area ring vanishes
    flat = [np.array([[0, 0], [10, 0], [5, 0]], float)]
    assert normalize(flat) == []


def test_stitch_vec_matches_small_path():
    """The vectorized large-table event extraction and the dict-based
    small path produce identical ring sets (same canonical multiset of
    vertices) on a union big enough to trigger the numpy path."""
    import numpy as np

    from brdrq_spark.geom.clip import (
        _stitch_events_small,
        _stitch_events_vec,
        _weld_and_chain,
        _trap_table,
        _traps_from_table,
        _INV_SNAP,
    )

    rng = np.random.default_rng(5)
    rects = []
    for i in range(60):  # overlapping grid of rectangles -> big trap table
        x0 = float(rng.integers(0, 40))
        y0 = float(rng.integers(0, 40))
        w = float(rng.integers(2, 9))
        h = float(rng.integers(2, 9))
        rects.append(
            np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])
        )
    tbl = _trap_table(rects, [])
    traps = _traps_from_table(tbl, "union")
    K = np.round(np.asarray(traps, dtype=np.float64) * _INV_SNAP).astype(np.int64)
    assert len(K) >= 96  # ensure the vec path is the live one

    def canon(rings):
        return sorted(
            tuple(sorted(map(tuple, np.round(r, 6)))) for r in rings
        )

    a = canon(_weld_and_chain(_stitch_events_small(K)))
    b = canon(_weld_and_chain(_stitch_events_vec(K)))
    assert a == b and len(a) >= 1


def test_wide_span_union_void_fallback():
    """Geometry spanning more than 2^31 snap units (~2.1 km) takes the
    void-record grouping fallbacks in the vectorized weld and chain
    (packed int64 node keys would overflow). A 3 km chain of 200
    overlapping squares welds into ONE ring with the exact chained
    area: 100 pair-unions of 950 m² minus 99 chain overlaps of 100 m²."""
    import numpy as np

    from brdrq_spark.geom.clip import boolean_op
    from brdrq_spark.geom.core import ring_area

    sq = lambda x0, y0, s: np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]]
    )
    a = [sq(i * 30.0, 0.0, 25.0) for i in range(100)]
    b = [sq(i * 30.0 + 10.0, 5.0, 25.0) for i in range(100)]
    out = boolean_op(a, b, "union")
    assert len(out) == 1
    assert abs(abs(ring_area(out[0])) - (100 * 950.0 - 99 * 100.0)) < 1e-6


def test_split_parts_groups_holes_with_outers():
    import numpy as np

    from brdrq_spark.geom.core import ring_area, split_parts

    def rect(x0, y0, w, h, ccw=True):
        r = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]], float
        )
        return r if ccw else r[::-1]

    # two outers, one hole inside each, one hole inside the SECOND
    rings = [
        rect(0, 0, 10, 10),                # outer A
        rect(20, 0, 10, 10),               # outer B
        rect(2, 2, 2, 2, ccw=False),       # hole in A
        rect(22, 2, 2, 2, ccw=False),      # hole in B
        rect(26, 6, 1, 1, ccw=False),      # second hole in B
    ]
    parts = split_parts(rings)
    assert len(parts) == 2
    sizes = sorted(len(p) for p in parts)
    assert sizes == [2, 3]
    for p in parts:
        outer = [r for r in p if ring_area(r) > 0]
        assert len(outer) == 1
        x0 = outer[0][:, 0].min()
        for h in p:
            if ring_area(h) < 0:
                assert h[:, 0].min() > x0  # hole sits inside its outer

    # single polygon passes through unchanged
    single = [rect(0, 0, 5, 5), rect(1, 1, 1, 1, ccw=False)]
    assert split_parts(single) == [single]


def test_split_parts_concave_hole_centroid_outside():
    """A U-shaped hole whose vertex centroid falls OUTSIDE its outer
    ring still groups with that outer (vertex majority vote), not with
    an unrelated part."""
    import numpy as np

    from brdrq_spark.geom.core import ring_area, split_parts

    # outer U: 30x30 frame with the top-middle notch removed (concave)
    outer_u = np.array(
        [[0, 0], [30, 0], [30, 30], [20, 30], [20, 10], [10, 10],
         [10, 30], [0, 30]], float
    )
    # concave hole hugging the U's left arm bottom (its centroid lands
    # in the notch, outside the outer)
    hole_u = np.array(
        [[2, 2], [28, 2], [28, 8], [22, 8], [22, 4], [8, 4],
         [8, 8], [2, 8]], float
    )[::-1]
    square = np.array([[100, 0], [110, 0], [110, 10], [100, 10]], float)
    parts = split_parts([outer_u, square, hole_u])
    assert len(parts) == 2
    for p in parts:
        net = sum(ring_area(r) for r in p)
        assert net > 0  # no part carries a foreign hole
    u_part = next(p for p in parts if len(p) == 2)
    assert ring_area(u_part[0]) > 0 and ring_area(u_part[1]) < 0


def test_polygon_bboxes_batch_equivalence():
    """The vectorized batch bbox decoder is bit-identical to the per-row
    path on synthetic parcels/themes and routes every exotic shape it
    cannot handle to fallback."""
    import struct

    import numpy as np

    from brdrq_spark.geom import bbox as _bbox
    from brdrq_spark.geom.wkb import (
        lines_to_wkb,
        polygon_bboxes_batch,
        rings_from_wkb,
        rings_to_wkb,
    )
    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    wkbs = list(reference_parcels(8, 8, seed=7).geom_wkb) + list(
        thematic_polygons(64, 8, 8, seed=7, jitter=1.0).geom_wkb
    )
    bb, nv, fb = polygon_bboxes_batch(wkbs)
    assert not fb.any()
    for k, w in enumerate(wkbs):
        assert tuple(bb[k]) == _bbox(rings_from_wkb(w))
        assert nv[k] == len(rings_from_wkb(w))

    def raw_poly(rings, gt=3):
        parts = [struct.pack("<BII", 1, gt, len(rings))]
        for r in rings:
            parts.append(struct.pack("<I", len(r)))
            parts.append(np.asarray(r, dtype=np.float64).astype("<f8").tobytes())
        return b"".join(parts)

    sq = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    hole = [[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]]
    deg = [[1, 1], [1, 1], [1, 1]]
    zsq = [[0, 0, 7], [10, 0, 7], [10, 10, 7], [0, 10, 7], [0, 0, 7]]
    cases = [
        rings_to_wkb([np.array(sq[:-1], float)]),      # canonical multi
        raw_poly([sq, hole]),                          # polygon + hole
        raw_poly([deg]),                               # all-degenerate
        raw_poly([deg, sq]),                           # mixed
        struct.pack("<BII", 1, 6, 0),                  # empty multipolygon
        struct.pack("<BII", 1, 1003, 1)                # Z polygon
        + struct.pack("<I", 5)
        + np.asarray(zsq, float).astype("<f8").tobytes(),
        None,
        b"",
    ]
    bb, nv, fb = polygon_bboxes_batch(cases)
    assert not fb.any()
    assert list(nv) == [1, 2, 0, 1, 0, 1, 0, 0]
    for k in (0, 1, 3, 5):
        assert tuple(bb[k]) == _bbox(rings_from_wkb(cases[k]))

    # exotic shapes -> fallback, never silent garbage
    good = rings_to_wkb([np.array(sq[:-1], float)])
    overcount = good[:5] + struct.pack("<I", 2) + good[9:]  # npolys 1->2
    exotic = [
        struct.pack(">BII", 0, 3, 1)                  # big-endian
        + struct.pack(">I", 5)
        + np.asarray(sq, float).astype(">f8").tobytes(),
        lines_to_wkb([np.array(sq, float)]),          # linestring
        raw_poly([sq])[:30],                          # truncated
        struct.pack("<BII", 1, 99, 1),                # unknown type
        # cursor walks to end-of-buffer with polys_left > 0: must take
        # the fallback path even as the batch's LAST row (an unguarded
        # header-byte gather used to IndexError out of the walk here)
        overcount,
    ]
    _, _, fb = polygon_bboxes_batch(exotic)
    assert fb.all()
    _, _, fb = polygon_bboxes_batch([overcount])
    assert fb.all()


def test_rings_from_wkb_batch_equivalence():
    """The batch ring decoder is bit-identical to rings_from_wkb —
    same ring order, snapped/deduped vertices, orientation flips, and
    degenerate-ring drops — and falls back per-row on exotic shapes."""
    import struct

    import numpy as np

    from brdrq_spark.geom.wkb import (
        lines_to_wkb,
        rings_from_wkb,
        rings_from_wkb_batch,
        rings_to_wkb,
    )
    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    def raw_poly(rings, gt=3):
        parts = [struct.pack("<BII", 1, gt, len(rings))]
        for r in rings:
            parts.append(struct.pack("<I", len(r)))
            parts.append(np.asarray(r, dtype=np.float64).astype("<f8").tobytes())
        return b"".join(parts)

    sq = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    hole = [[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]]
    dup = [[0, 0], [0, 0], [5, 0], [5, 5], [5, 5], [0, 5], [0, 0]]
    wkbs = (
        list(reference_parcels(6, 6, seed=5).geom_wkb)
        + list(thematic_polygons(40, 8, 8, seed=5, jitter=1.0).geom_wkb)
        + [
            rings_to_wkb([np.array(sq[:-1], float)]),
            raw_poly([sq[::-1], hole[::-1]]),        # wrong orientations -> flip
            raw_poly([[[1, 1], [1, 1], [1, 1]]]),    # degenerate
            raw_poly([dup]),                         # consecutive dups
            raw_poly([[[0, 0], [5, 0], [0, 0]]]),    # zero-area
            struct.pack("<BII", 1, 6, 0),            # empty multipolygon
            None,
            b"",
            struct.pack(">BII", 0, 3, 1)             # big-endian -> fallback
            + struct.pack(">I", 5)
            + np.asarray(sq, float).astype(">f8").tobytes(),
            lines_to_wkb([np.array(sq, float)]),     # linestring -> []
        ]
    )
    got = rings_from_wkb_batch(wkbs)
    for k, w in enumerate(wkbs):
        exp = rings_from_wkb(w)
        assert len(got[k]) == len(exp), k
        for g, e in zip(got[k], exp):
            assert g.shape == e.shape and (g == e).all(), k


def test_winding_cumsum_fallback_identical(monkeypatch):
    """The >=2^30-row guard (ADVICE r7) routes the packed two-field
    winding cumsum to two separate cumsums; forcing that fallback must
    leave every boolean op bit-identical."""
    from brdrq_spark.geom import clip as C

    rings_a = [
        np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]),
        np.array([[2.0, 2.0], [2.0, 8.0], [8.0, 8.0], [8.0, 2.0]]),  # hole
    ]
    rings_b = [np.array([[5.0, -3.0], [14.0, 1.5], [9.0, 12.0], [4.0, 6.0]])]
    # force the vectorized table (scalar small path bypasses the cumsum)
    monkeypatch.setattr(C, "_SMALL_TRAP_VERTS", 0)
    base = {
        op: C.boolean_op(rings_a, rings_b, op)
        for op in ("union", "intersection", "difference", "symdiff")
    }
    monkeypatch.setattr(C, "_PACK_MAX_ROWS", 0)  # force the fallback
    for op, want in base.items():
        got = C.boolean_op(rings_a, rings_b, op)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert np.array_equal(g, w), op
