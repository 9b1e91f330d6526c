"""Property-based consistency checks on the boolean engine.

Invariants that hold for any pair of polygons:
  area(A∩B) + area(A\\B) = area(A)
  area(A∪B) = area(A) + area(B) - area(A∩B)
  area(AΔB) = area(A∪B) - area(A∩B)
Run over seeded random star-shaped polygons (degeneracy-rich: snapped
coords, occasional shared edges).
"""

import numpy as np
import pytest

from brdrq_spark.geom import boolean_op, normalize, rings_area
from brdrq_spark.geom.clip import area_of_op


def star_poly(rng, cx, cy, rmin, rmax, n):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(rmin, rmax, n)
    pts = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    return np.round(pts, 2)  # coarse coords => exact-touch degeneracies


@pytest.mark.parametrize("seed", range(12))
def test_boolean_area_identities(seed):
    rng = np.random.default_rng(seed)
    a = normalize([star_poly(rng, 0, 0, 2, 8, rng.integers(5, 40))])
    b = normalize(
        [star_poly(rng, rng.uniform(-4, 4), rng.uniform(-4, 4), 2, 8, rng.integers(5, 40))]
    )
    area_a = rings_area(a)
    area_b = rings_area(b)
    inter = area_of_op(a, b, "intersection")
    diff = area_of_op(a, b, "difference")
    union = area_of_op(a, b, "union")
    sym = area_of_op(a, b, "symdiff")
    tol = 1e-5 * max(1.0, area_a + area_b)
    assert inter + diff == pytest.approx(area_a, abs=tol)
    assert union == pytest.approx(area_a + area_b - inter, abs=tol)
    assert sym == pytest.approx(union - inter, abs=tol)
    # stitched boundary agrees with the trapezoid area
    for op in ("intersection", "union", "difference", "symdiff"):
        stitched = boolean_op(a, b, op)
        assert rings_area(stitched) == pytest.approx(area_of_op(a, b, op), abs=tol)
    # idempotence of normalize on clean output
    u = boolean_op(a, b, "union")
    assert rings_area(normalize(u)) == pytest.approx(union, abs=tol)


@pytest.mark.parametrize("seed", range(12))
def test_boolean_op_multi_matches_separate_ops(seed):
    """boolean_op_multi (one shared scanbeam table) must be ring-for-ring
    identical to the separate single-op passes — the alignment kernel's
    fused hot path depends on it."""
    from brdrq_spark.geom.clip import boolean_op_multi

    rng = np.random.default_rng(1000 + seed)
    a = normalize([star_poly(rng, 0, 0, 2, 8, rng.integers(5, 40))])
    b = normalize(
        [star_poly(rng, rng.uniform(-4, 4), rng.uniform(-4, 4), 2, 8, rng.integers(5, 40))]
    )
    ops = ("intersection", "difference", "rdifference", "union", "symdiff")
    multi = boolean_op_multi(a, b, ops)
    singles = [
        boolean_op(a, b, "intersection"),
        boolean_op(a, b, "difference"),
        boolean_op(b, a, "difference"),
        boolean_op(a, b, "union"),
        boolean_op(a, b, "symdiff"),
    ]
    for op, m, s in zip(ops, multi, singles):
        assert len(m) == len(s), op
        for rm, rs in zip(m, s):
            assert np.array_equal(rm, rs), op
    # symdiff == disjoint concatenation of the two differences (the
    # kernel substitutes that for a third pass)
    dplus, dmin = multi[1], multi[2]
    assert rings_area(dplus) + rings_area(dmin) == pytest.approx(
        rings_area(multi[4]), abs=1e-6
    )


@pytest.mark.parametrize("seed", range(8))
def test_batch_decoders_match_scalar_on_random_wkb(seed):
    """Seeded fuzz: raw WKB assembled from random ring soups (mixed
    polygon/multipolygon, Z/M dims, duplicate and near-duplicate
    vertices, unclosed rings, wrong orientations, empty containers) —
    the batch decoders must be bit-identical to the per-row path for
    every row, and route anything else to fallback rather than crash."""
    import struct

    from brdrq_spark.geom import bbox as _bbox
    from brdrq_spark.geom.wkb import (
        polygon_bboxes_batch,
        rings_from_wkb,
        rings_from_wkb_batch,
    )

    rng = np.random.default_rng(100 + seed)

    def rand_ring(n):
        pts = np.round(
            np.column_stack(
                [rng.uniform(-50, 50, n), rng.uniform(-50, 50, n)]
            ),
            rng.integers(0, 8),  # varied precision -> snap collisions
        )
        if rng.random() < 0.3 and n > 2:
            pts[rng.integers(1, n)] = pts[0]  # planted duplicate vertex
        if rng.random() < 0.5:
            pts = np.vstack([pts, pts[:1]])  # sometimes closed
        if rng.random() < 0.5:
            pts = pts[::-1]  # random orientation
        return pts

    def raw(rings, gt, zdim=0):
        nd = {0: 2, 1: 3, 3: 4}[zdim]
        parts = [struct.pack("<BII", 1, gt + 1000 * zdim, len(rings))]
        for r in rings:
            r3 = np.column_stack([r] + [np.full(len(r), 7.0)] * (nd - 2))
            parts.append(struct.pack("<I", len(r)))
            parts.append(r3.astype("<f8").tobytes())
        return b"".join(parts)

    wkbs = []
    for _ in range(40):
        kind = rng.integers(0, 4)
        zdim = int(rng.choice([0, 0, 0, 1, 3]))
        if kind == 0:  # plain polygon, 1-3 rings
            wkbs.append(
                raw([rand_ring(rng.integers(3, 12)) for _ in range(rng.integers(1, 4))],
                    3, zdim)
            )
        elif kind == 1:  # multipolygon of 0-3 polygons
            npoly = rng.integers(0, 4)
            body = b"".join(
                raw([rand_ring(rng.integers(3, 10))], 3, zdim) for _ in range(npoly)
            )
            wkbs.append(struct.pack("<BII", 1, 6, npoly) + body)
        elif kind == 2:  # degenerate: tiny/collapsed rings
            wkbs.append(raw([rand_ring(3), np.zeros((3, 2))], 3, 0))
        else:
            wkbs.append(None if rng.random() < 0.5 else b"")

    got_rings = rings_from_wkb_batch(wkbs)
    bb, nv, fb = polygon_bboxes_batch(wkbs)
    assert not fb.any()  # all generated shapes are walkable
    for k, w in enumerate(wkbs):
        exp = rings_from_wkb(w)
        assert len(got_rings[k]) == len(exp) == nv[k], k
        for g, e in zip(got_rings[k], exp):
            assert g.shape == e.shape and (g == e).all(), k
        if exp:
            assert tuple(bb[k]) == _bbox(exp), k


@pytest.mark.parametrize("seed", range(6))
def test_small_trap_table_bit_identical(seed):
    """The scalar small-input scanbeam table must be BIT-identical to
    the vectorized one — including coincident shared edges (stable sort
    order drives the winding cumsums) and identical operands."""
    from brdrq_spark.geom.clip import _trap_table_np, _trap_table_small

    def eq(t1, t2):
        if t1 is None or t2 is None:
            return t1 is None and t2 is None
        return all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(t1, t2)
        )

    rng = np.random.default_rng(200 + seed)
    rect = lambda x0, y0, x1, y1: np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float
    )
    adversarial = [
        ([rect(0, 0, 10, 10)], [rect(0, 0, 10, 10)]),        # a == b
        ([rect(0, 0, 10, 10)], [rect(10, 0, 20, 10)]),       # shared edge
        ([rect(0, 0, 10, 10)], [rect(0, 10, 10, 20)]),       # shared horiz
        ([rect(0, 0, 10, 10), rect(0, 0, 10, 10)[::-1]], [rect(2, 2, 8, 8)]),
        ([rect(0, 0, 10, 10)], []),
        ([], []),
    ]
    for a, b in adversarial:
        assert eq(_trap_table_small(a, b), _trap_table_np(a, b))
    for _ in range(60):
        a = [star_poly(rng, 0, 0, 1, 6, rng.integers(3, 8))]
        b = [
            star_poly(
                rng, rng.uniform(-3, 3), rng.uniform(-3, 3), 1, 6,
                rng.integers(3, 8),
            )
        ]
        assert eq(_trap_table_small(a, b), _trap_table_np(a, b))


@pytest.mark.parametrize("seed", range(8))
def test_erode_nonempty_matches_exact(seed):
    """The certificate-screened erosion decision must equal the exact
    table's decision on every input — realistic uncov/inter shapes
    (boolean-op leftovers), thin slivers straddling the 2d' width
    threshold, bent L/U slivers a bbox bound can't see, multi-lobe
    sets, holes, and unnormalized (lone-CW) input."""
    from brdrq_spark.geom.buffer import _TINY, erode_area, erode_nonempty

    def check(rings, d, nseg=8):
        assert erode_nonempty(rings, d, nseg) == (
            erode_area(rings, d, nseg) > _TINY
        ), (d, nseg, [r.tolist() for r in rings])

    rng = np.random.default_rng(7000 + seed)
    rect = lambda x0, y0, x1, y1: np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float
    )
    dp = 1.0 * np.cos(np.pi / 8)  # d'=0.924 at d=1, nseg=8
    adversarial = [
        # widths straddling the survival threshold 2d'
        [rect(0, 0, 30, 2 * dp - 0.01)],
        [rect(0, 0, 30, 2 * dp + 0.05)],
        [rect(0, 0, 30, 2 * dp)],  # inside the margin band: must fall back
        # bent L-sliver: big bbox, nothing survives
        [np.array([[0, 0], [30, 0], [30, 30], [29, 30], [29, 1], [0, 1]], float)],
        # U-sliver around three sides
        [np.array(
            [[0, 0], [30, 0], [30, 30], [0, 30], [0, 29], [29, 29], [29, 1], [0, 1]],
            float,
        )],
        # two disjoint lobes, neither fits a disk
        [rect(0, 0, 30, 1), rect(0, 10, 1, 40)],
        # two lobes, one fat
        [rect(0, 0, 30, 1), rect(0, 10, 5, 40)],
        # square with a hole leaving a thin annulus
        [rect(0, 0, 10, 10), rect(1, 1, 9, 9)[::-1]],
        # square with a small hole (survives)
        [rect(0, 0, 10, 10), rect(4, 4, 6, 6)[::-1]],
        # unnormalized: lone CW ring is a FILLED region under nonzero
        # winding — the certificate must not call it empty
        [rect(0, 0, 10, 10)[::-1]],
        # CW square bbox-nested in a thin CCW L-band but geometrically
        # outside it: a filled region, not a hole — bbox containment
        # must not be trusted as nesting (caught a live bug)
        [
            np.array(
                [[0, 0], [30, 0], [30, 0.1], [0.1, 0.1], [0.1, 30], [0, 30]],
                float,
            ),
            rect(5, 5, 25, 25)[::-1],
        ],
        # free-standing CW thin L-band alone (wrong-side join pruning)
        [
            np.array(
                [[0, 0], [30, 0], [30, 0.1], [0.1, 0.1], [0.1, 30], [0, 30]],
                float,
            )[::-1]
        ],
        # alternating-orientation strip decomposition: every strip's
        # boundary is eroded, shared edges included
        [
            rect(i, 0, i + 1, 10) if i % 2 == 0 else rect(i, 0, i + 1, 10)[::-1]
            for i in range(6)
        ],
        # interlocked L's: disjoint regions, overlapping bboxes
        [
            np.array(
                [[0, 0], [10, 0], [10, 1], [1, 1], [1, 10], [0, 10]], float
            ),
            np.array(
                [[2, 2], [10, 2], [10, 10], [9, 10], [9, 3], [2, 3]], float
            ),
        ],
        # overlapping thin CCW bands (stacked winding in the overlap)
        [rect(0, 0, 30, 0.4), rect(0, 0.2, 30, 0.6)],
        # fat quad (the common intersection shape: survives big d)
        [rect(0, 0, 9, 9)],
        # winding-2: two identical overlapping CCW rings (net shoelace
        # doubles — certificates must not be fooled by inflated area)
        [rect(0, 0, 9, 9), rect(0, 0, 9, 9)],
        # self-intersecting bowtie: both lobes filled under nonzero
        # winding, net shoelace ~0
        [np.array([[0, 0], [10, 0], [0, 8], [10, 8]], float)],
        # empty / degenerate
        [],
        [np.zeros((3, 2))],
    ]
    for rings in adversarial:
        for d in (0.05, 0.5, 1.0, 3.0):
            check(rings, d)
    # coarse-prescreen ambiguity window: band widths between the 4-gon
    # pre-table's survival threshold (2·d·cos(π/4) ≈ 1.41d) and the
    # exact 16-gon's (2·d·cos(π/16) ≈ 1.96d) read NONEMPTY in the
    # coarse table but EMPTY in the exact one — the prescreen must fall
    # through to the exact table, not fire
    for w in (1.5, 1.7, 1.9):
        check([rect(0, 0, 30, w)], 1.0, nseg=16)
        bent = np.array(
            [[0, 0], [30, 0], [30, 30], [30 - w, 30], [30 - w, w], [0, w]],
            float,
        )
        check([bent], 1.0, nseg=16)
    # realistic relevance-test shapes: uncov = parcel \ jittered copy
    # (jitter snapped to 0.25 to keep the EXACT reference path fast —
    # unsnapped jitter breeds micro-lobe messes whose reference
    # erode_area table takes seconds; decisions were verified equal
    # there too, just too slowly for CI)
    for _ in range(8):
        a = normalize([star_poly(rng, 0, 0, 4, 9, rng.integers(5, 12))])
        jit = [r + np.round(rng.uniform(-1, 1, r.shape) * 4) / 4 for r in a]
        uncov = boolean_op(a, normalize(jit), "difference")
        inter = boolean_op(a, normalize(jit), "intersection")
        for rings in (uncov, inter):
            for d in (0.25, 1.0):
                for nseg in (8, 16):
                    check(rings, d, nseg)


@pytest.mark.parametrize("seed", range(6))
def test_weld_and_chain_matches_reference(seed):
    """The vectorized weld + degree-1 chain fast path must reproduce the
    sequential dict-based pass EXACTLY — ring values, ring order, and
    ring start vertices — on raw event streams from real trapezoid
    tables (random star pairs, junction-heavy crossing/shared-edge
    cases, and capsule blocks)."""
    from brdrq_spark.geom.clip import (
        _INV_SNAP,
        _stitch_events_small,
        _stitch_events_vec,
        _weld_and_chain,
        _MIN_AREA,
        _WELD,
        SNAP,
    )
    from brdrq_spark.geom.core import ring_area
    from brdrq_spark.geom.buffer import boundary_capsules

    def reference_weld_and_chain(raw):
        # verbatim pre-vectorization implementation
        from collections import defaultdict

        nodes_by_y = {}
        for p, q in raw:
            nodes_by_y.setdefault(p[1], []).append(p[0])
            nodes_by_y.setdefault(q[1], []).append(q[0])
        remap = {}
        for ky, xs_list in nodes_by_y.items():
            xs_sorted = sorted(set(xs_list))
            group_rep = xs_sorted[0] if xs_sorted else 0
            for i, x in enumerate(xs_sorted):
                if i > 0 and x - xs_sorted[i - 1] > _WELD:
                    group_rep = x
                remap[(x, ky)] = (group_rep, ky)
        merged = defaultdict(int)
        for p, q in raw:
            p2, q2 = remap[p], remap[q]
            if p2 == q2:
                continue
            if merged[(q2, p2)] > 0:
                merged[(q2, p2)] -= 1
            else:
                merged[(p2, q2)] += 1
        segs = []
        for (p, q), cnt in merged.items():
            segs.extend([(p, q)] * cnt)
        out_map = defaultdict(list)
        for si, (p, q) in enumerate(segs):
            out_map[p].append(si)
        used = [False] * len(segs)
        rings = []
        from brdrq_spark.geom.clip import _merge_collinear, _turn_angle

        for start in range(len(segs)):
            if used[start]:
                continue
            path = [segs[start][0], segs[start][1]]
            used[start] = True
            cur = segs[start][1]
            prev_pt = segs[start][0]
            guard = 0
            while cur != path[0] and guard < len(segs) + 2:
                guard += 1
                cands = [i for i in out_map.get(cur, []) if not used[i]]
                if not cands:
                    break
                if len(cands) == 1:
                    nxt = cands[0]
                else:
                    vin = (cur[0] - prev_pt[0], cur[1] - prev_pt[1])
                    fwd = [i for i in cands if segs[i][1] != prev_pt]
                    pool = fwd or cands
                    nxt = max(
                        pool,
                        key=lambda i: _turn_angle(
                            vin, (segs[i][1][0] - cur[0], segs[i][1][1] - cur[1])
                        ),
                    )
                used[nxt] = True
                prev_pt = cur
                cur = segs[nxt][1]
                path.append(cur)
            if cur == path[0] and len(path) > 3:
                ring = np.asarray(path[:-1], dtype=np.float64) * SNAP
                ring = _merge_collinear(ring)
                if len(ring) >= 3 and abs(ring_area(ring)) > _MIN_AREA:
                    rings.append(ring)
        return rings

    def check_input(a_rings, b_rings, op="difference"):
        from brdrq_spark.geom.clip import _trapezoids

        traps = _trapezoids(a_rings, b_rings, op)
        if not len(traps):
            return
        K = np.round(np.asarray(traps, dtype=np.float64) * _INV_SNAP).astype(
            np.int64
        )
        from brdrq_spark.geom.clip import (
            _weld_segments_small,
            _weld_segments_vec,
        )

        def as_tuples(x):
            # vec paths speak (n, 4) int64 arrays; the sequential
            # reference speaks tuple pairs — normalize for comparison
            if isinstance(x, np.ndarray):
                return [
                    ((int(a), int(b)), (int(c), int(d)))
                    for a, b, c, d in x.tolist()
                ]
            return list(x)

        for events in (_stitch_events_small, _stitch_events_vec):
            raw = events(K)
            raw_list = as_tuples(raw)
            if raw_list:
                # both weld variants, forced regardless of size; the vec
                # weld must also accept list input (legacy shape)
                assert as_tuples(_weld_segments_vec(raw_list)) == (
                    _weld_segments_small(raw_list)
                )
                assert as_tuples(_weld_segments_vec(raw)) == (
                    _weld_segments_small(raw_list)
                )
            got = _weld_and_chain(raw)
            exp = reference_weld_and_chain(raw_list)
            assert len(got) == len(exp), (len(got), len(exp))
            for g, e in zip(got, exp):
                assert np.array_equal(g, e)

    rng = np.random.default_rng(9100 + seed)
    rect = lambda x0, y0, x1, y1: np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float
    )
    # junction-heavy adversarial cases (shared edges, crossings, nesting)
    check_input([rect(0, 0, 10, 10)], [rect(5, 0, 15, 10)])
    check_input([rect(0, 0, 10, 10)], [rect(10, 0, 20, 10)], "union")
    check_input([rect(0, 0, 10, 10)], [rect(2, 2, 8, 8)])
    check_input([rect(0, 0, 10, 10), rect(20, 0, 30, 10)], [rect(5, -5, 25, 5)])
    check_input([rect(0, 0, 10, 10)], [rect(0, 0, 10, 10)])  # identical
    # capsule blocks (the kernel hot shape)
    star = star_poly(rng, 0, 0, 5, 9, 8)
    caps = boundary_capsules([star], 1.0, 8, joins="interior")
    if caps:
        check_input([star], caps)
    # random star pairs
    for _ in range(25):
        a = [star_poly(rng, 0, 0, 3, 7, rng.integers(3, 9))]
        b = [
            star_poly(
                rng, rng.uniform(-4, 4), rng.uniform(-4, 4), 3, 7,
                rng.integers(3, 9),
            )
        ]
        for op in ("difference", "intersection", "union"):
            check_input(a, b, op)
