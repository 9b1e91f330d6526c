"""End-to-end tests of candidate generation + the align operator
(SURVEY.md §7.1 M3: the minimum end-to-end slice, mirroring the
reference scenario test_autocorrectborders_local_referencelayer —
plugin/brdrq/test/test_autocorrectborders.py:221-264: align jittered
thematic polygons to a local reference layer at rd=2; every input
feature yields a result row, geometry snaps to parcel borders)."""

import numpy as np
import pytest

from brdrq_spark.geom import rings_area, rings_from_wkb
from brdrq_spark.geom.clip import area_of_op
from brdrq_spark.operators.align import AlignConfig, align
from brdrq_spark.operators.candidates import candidate_pairs
from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

NX = NY = 12
N_THEMES = 8


@pytest.fixture(scope="module")
def tables(spark):
    ref = spark.createDataFrame(reference_parcels(NX, NY, seed=21))
    th = spark.createDataFrame(thematic_polygons(N_THEMES, NX, NY, seed=21, jitter=1.0))
    return th, ref


def test_candidate_pairs_contain_source_parcel(spark, tables):
    th, ref = tables
    pairs = candidate_pairs(th, ref, max_rd=2.0).collect()
    by_theme = {}
    for row in pairs:
        by_theme.setdefault(row.theme_id, set()).add(row.ref_id)
    src = {r.theme_id: r.src_parcel for r in th.collect()}
    assert len(by_theme) == N_THEMES
    for tid, parcels in by_theme.items():
        # jittered copy of parcel X must have X among its candidates
        assert any(p.endswith(src[tid]) for p in parcels), (tid, parcels)
        # and not absurdly many candidates (pruning works)
        assert len(parcels) <= 16


def test_align_snaps_to_source_parcel(spark, tables):
    th, ref = tables
    cfg = AlignConfig(relevant_distances=[2.0])
    out = align(spark, th, ref, cfg).collect()
    assert len(out) == N_THEMES  # one row per theme at one rd

    ref_rows = {r.ref_id: r.geom_wkb for r in ref.collect()}
    src = {r.theme_id: r.src_parcel for r in th.collect()}
    for row in out:
        assert row.brdr_relevant_distance == 2.0
        assert row.brdr_area > 0
        parcel_wkb = next(
            w for rid, w in ref_rows.items() if rid.endswith(src[row.theme_id])
        )
        parcel = rings_from_wkb(parcel_wkb)
        result = rings_from_wkb(row.result_wkb)
        sym = area_of_op(result, parcel, "symdiff")
        # snapped: residual mismatch vs the source parcel is < 2% of area
        assert sym < 0.02 * rings_area(parcel), (row.theme_id, sym)
        # diff layers are consistent: |plus| + |min| == |symdiff vs theme|
        a_plus = rings_area(rings_from_wkb(row.result_diff_plus_wkb))
        a_min = rings_area(rings_from_wkb(row.result_diff_min_wkb))
        a_diff = rings_area(rings_from_wkb(row.result_diff_wkb))
        assert a_plus + a_min == pytest.approx(a_diff, abs=1e-3)
        # metrics agree with geometries
        assert row.brdr_area == pytest.approx(rings_area(result), abs=1e-6)
        assert row.brdr_sym_diff_area_index_perc == pytest.approx(
            100 * row.brdr_sym_diff_area_index, abs=1e-9
        )
        # tile assignments: non-empty, sorted, deterministic
        assert row.cell_ids == sorted(row.cell_ids)
        assert len(row.cell_ids) >= 1
        assert row.brdr_full_actual in (True, False)


def test_align_deterministic_across_parallelism(spark, tables):
    th, ref = tables
    cfg = AlignConfig(relevant_distances=[1.0, 2.0])
    out1 = align(spark, th, ref, cfg)
    a = {
        (r.theme_id, r.brdr_relevant_distance): (r.brdr_area, tuple(r.cell_ids))
        for r in out1.collect()
    }
    out2 = align(spark, th.repartition(7), ref.repartition(3), cfg)
    b = {
        (r.theme_id, r.brdr_relevant_distance): (r.brdr_area, tuple(r.cell_ids))
        for r in out2.collect()
    }
    assert a == b  # bit-for-bit tile assignments + areas, any partitioning


def test_align_od_strategies(spark):
    # a theme half-on / half-off the reference tessellation edge
    from brdrq_spark.geom import rings_to_wkb
    import pandas as pd

    ref_pdf = reference_parcels(4, 4, seed=33)
    # theme sticking out of the tessellation: half inside first parcel,
    # half outside the whole grid (west of origin)
    theme_ring = np.array(
        [[169968.0, 170008.0], [170032.0, 170008.0], [170032.0, 170056.0], [169968.0, 170056.0]]
    )
    th_pdf = pd.DataFrame(
        [{"theme_id": "t_od", "geom_wkb": rings_to_wkb([theme_ring])}]
    )
    spark_th = spark.createDataFrame(th_pdf)
    spark_ref = spark.createDataFrame(ref_pdf)

    as_is = align(
        spark, spark_th, spark_ref, AlignConfig(relevant_distances=[2.0], od_strategy="AS_IS")
    ).collect()[0]
    excl = align(
        spark, spark_th, spark_ref, AlignConfig(relevant_distances=[2.0], od_strategy="EXCLUDE")
    ).collect()[0]
    # AS_IS keeps the overhang, EXCLUDE drops it: ~half the area
    assert as_is.brdr_area > excl.brdr_area
    assert excl.brdr_area == pytest.approx(as_is.brdr_area / 2, rel=0.2)


def test_align_no_candidates(spark):
    from brdrq_spark.geom import rings_to_wkb
    import pandas as pd

    far = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    th = spark.createDataFrame(
        pd.DataFrame([{"theme_id": "t_far", "geom_wkb": rings_to_wkb([far])}])
    )
    ref = spark.createDataFrame(reference_parcels(3, 3, seed=1))
    row = align(spark, th, ref, AlignConfig(relevant_distances=[2.0])).collect()[0]
    assert row.brdr_remark == "no_reference_candidates"
    # AS_IS: keeps the original geometry
    assert row.brdr_area == pytest.approx(100.0, abs=0.5)


def test_od_snap_strategies_kernel():
    """OD SNAP semantics (docs/autocorrectborders.md:188-193): theme
    overhangs parcel A toward parcel B; the OD free edge at x=11.5 sits
    0.5 m from B's boundary (x=12) and 1.5 m from A's (x=10).
    SNAP_ALL_SIDE moves it outward onto B; SNAP_SINGLE_SIDE only allows
    inner-side movement so the free edge stays."""
    import pandas as pd

    from brdrq_spark.geom import bbox, rings_from_wkb, rings_to_wkb
    from brdrq_spark.operators.align import _make_kernel

    A = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    B = np.array([[12.0, 0.0], [20.0, 0.0], [20.0, 10.0], [12.0, 10.0]])
    T_ring = np.array([[2.0, 2.0], [11.5, 2.0], [11.5, 8.0], [2.0, 8.0]])

    def run(strategy):
        cfg = AlignConfig(relevant_distances=[2.0], od_strategy=strategy)
        pdf = pd.DataFrame(
            {
                "theme_id": ["t"] * 2,
                "theme_wkb": [rings_to_wkb([T_ring])] * 2,
                "ref_wkb": [rings_to_wkb([A]), rings_to_wkb([B])],
            }
        )
        row = _make_kernel(cfg, 10)(pdf).iloc[0]
        return rings_from_wkb(row["result_wkb"])

    all_side = run("SNAP_ALL_SIDE")
    single = run("SNAP_SINGLE_SIDE")
    as_is = run("AS_IS")
    exclude = run("EXCLUDE")
    assert bbox(all_side)[2] == pytest.approx(12.0, abs=0.05)
    assert bbox(single)[2] == pytest.approx(11.5, abs=0.05)
    assert bbox(as_is)[2] == pytest.approx(11.5, abs=0.05)
    assert bbox(exclude)[2] == pytest.approx(10.0, abs=0.05)
    # snapped OD still covers at least the AS_IS interior area
    assert rings_area(all_side) >= rings_area(exclude)


def test_align_hybrid_wkb_shipping_same_output(spark, tables):
    """Oversized features ship ids-only through the cell explode and
    re-join their WKB (AlignConfig.max_inline_wkb_bytes); forcing every
    feature onto that path must not change a single output value."""
    th, ref = tables
    base = {
        r.theme_id: (round(r.brdr_area, 9), tuple(r.cell_ids))
        for r in align(
            spark, th, ref, AlignConfig(relevant_distances=[2.0]), broadcast_ref=False
        ).collect()
    }
    forced = {
        r.theme_id: (round(r.brdr_area, 9), tuple(r.cell_ids))
        for r in align(
            spark,
            th,
            ref,
            AlignConfig(relevant_distances=[2.0], max_inline_wkb_bytes=1),
            broadcast_ref=False,
        ).collect()
    }
    assert base == forced and len(base) == N_THEMES


def test_multi_as_single_modus_parts(spark):
    """A MultiPolygon theme with two parts over two separate parcels
    snaps BOTH parts to their parcels under multi_as_single_modus=True
    (per-part relevance decisions, reference default)."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_from_wkb, rings_to_wkb, rings_area
    from brdrq_spark.operators.align import AlignConfig, align

    def ring(x0):
        return np.array([[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]])

    # two-part theme: each part shifted 0.3 east of its parcel
    th = spark.createDataFrame(
        pd.DataFrame(
            [{"theme_id": "m", "geom_wkb": rings_to_wkb([ring(0.3), ring(30.3)])}]
        )
    )
    ref = spark.createDataFrame(
        pd.DataFrame(
            [
                {"ref_id": "r0", "geom_wkb": rings_to_wkb([ring(0.0)])},
                {"ref_id": "r1", "geom_wkb": rings_to_wkb([ring(30.0)])},
            ]
        )
    )
    for modus in (True, False):
        cfg = AlignConfig(
            relevant_distances=[2.0], od_strategy="EXCLUDE",
            multi_as_single_modus=modus,
        )
        out = align(spark, th, ref, cfg, broadcast_ref=True).collect()
        assert len(out) == 1
        # both parts fully snap (uncovered strips erode at rd=2): area 200
        assert abs(out[0].brdr_area - 200.0) < 1e-6, modus
        assert out[0].brdr_nr_references == 2


def test_partial_snapping_knob(spark):
    """partial_snapping=True snaps the partial branch's grown boundary
    onto parcel edges: a theme covering half a parcel at small rd grows
    by rd, and with snapping its west edge lands exactly on the parcel
    border."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import bbox, rings_from_wkb, rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig, align

    parcel = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    half = np.array([[0.4, 0.0], [5.0, 0.0], [5.0, 10.0], [0.4, 10.0]])
    th = spark.createDataFrame(
        pd.DataFrame([{"theme_id": "t", "geom_wkb": rings_to_wkb([half])}])
    )
    ref = spark.createDataFrame(
        pd.DataFrame([{"ref_id": "r", "geom_wkb": rings_to_wkb([parcel])}])
    )
    res = {}
    for snap in (False, True):
        cfg = AlignConfig(
            relevant_distances=[0.3], od_strategy="EXCLUDE",
            partial_snapping=snap,
        )
        out = align(spark, th, ref, cfg, broadcast_ref=True).collect()[0]
        res[snap] = bbox(rings_from_wkb(out.result_wkb))[0]  # minx
    # without snapping the grown west edge stays at 0.4-rd=0.1; with
    # snapping it lands on the parcel border x=0
    assert res[False] > 0.05
    assert abs(res[True] - 0.0) < 1e-9


def test_crs_guards(spark):
    """align() mirrors the reference's CRS hard errors
    (brdrq_utils.py:1498-1502, 1551-1555); G5 bbox margin matches
    zoom_to_features' +10% extent expansion."""
    import numpy as np
    import pandas as pd
    import pytest

    from brdrq_spark.functions.crs import bbox_with_margin, require_same_crs
    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig, align

    sq = rings_to_wkb(
        [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])]
    )
    th = spark.createDataFrame(pd.DataFrame([{"theme_id": "t", "geom_wkb": sq}]))
    ref = spark.createDataFrame(pd.DataFrame([{"ref_id": "r", "geom_wkb": sq}]))
    with pytest.raises(ValueError, match="different CRS"):
        align(spark, th, ref, AlignConfig(ref_crs="EPSG:3812"), broadcast_ref=True)
    with pytest.raises(ValueError, match="defined CRS"):
        align(spark, th, ref, AlignConfig(crs=""), broadcast_ref=True)
    assert require_same_crs("EPSG:31370", "EPSG:31370") == "EPSG:31370"

    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"minx": 0.0, "miny": 0.0, "maxx": 10.0, "maxy": 20.0},
                {"minx": 5.0, "miny": -10.0, "maxx": 30.0, "maxy": 5.0},
            ]
        )
    )
    b = bbox_with_margin(df)  # combined (0,-10,30,20) + 10% of (30,30)
    assert b == (-3.0, -13.0, 33.0, 23.0)


def test_inradius_early_stop_decision_equivalence():
    """The halves-aware bisection (round-8 sweep optimization) must
    reproduce the FULL bisection's decisions exactly: the returned
    threshold is only ever compared as ``thr <= half`` against the grid
    halves, so for every grid half the early-stopped and full runs must
    agree — across jittered real-workload pieces AND the rd=0 edge
    (half=0 stays undetermined until the bracket's lo moves off 0)."""
    from brdrq_spark.geom import bbox as gbbox, bbox_distance
    from brdrq_spark.geom.clip import boolean_op_multi
    from brdrq_spark.operators.align import distance_grid, inradius

    ref = reference_parcels(16, 16, seed=5)
    th = thematic_polygons(24, 16, 16, seed=5, jitter=1.0)
    refsets = [rings_from_wkb(w) for w in ref.geom_wkb]
    refboxes = [gbbox(r) for r in refsets]

    for step in (0.1, 0.5):
        halves = np.asarray(
            sorted(rd / 2.0 for rd in distance_grid(5.0, step))
        )
        checked = 0
        for k in range(len(th)):
            trings = rings_from_wkb(th.geom_wkb.iloc[k])
            tb = gbbox(trings)
            for refs, bb in zip(refsets, refboxes):
                if bbox_distance(tb, bb) > 4.0:
                    continue
                inter, uncov = boolean_op_multi(
                    trings, refs, ("intersection", "rdifference")
                )
                for piece in (inter, uncov):
                    if not piece:
                        continue
                    full = inradius(piece, 8)
                    fast = inradius(piece, 8, halves=halves)
                    for h in halves:
                        assert (full <= h) == (fast <= h), (
                            f"step={step} half={h}: full={full} fast={fast}"
                        )
                    checked += 1
        assert checked > 40  # the fixture really exercised the path
