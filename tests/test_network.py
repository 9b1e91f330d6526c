"""NetworkGeometryProcessor analogue (A2): shared-boundary topology
preserved across adjacent features (reference dossier scenario,
plugin/brdrq/test/test_autocorrectborders.py:420-463)."""

import numpy as np
import pandas as pd
import pytest

from brdrq_spark.geom import rings_area, rings_from_wkb, rings_to_wkb
from brdrq_spark.geom.clip import area_of_op, boolean_op
from brdrq_spark.geom.wkb import _group_polygons
from brdrq_spark.operators.network import align_network


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])


def test_network_align_preserves_shared_edge(spark):
    # two reference parcels sharing the border x=10; two adjacent themes
    # sharing the (misdrawn) border x=10.4
    ref = spark.createDataFrame(
        pd.DataFrame(
            [
                {"ref_id": "rA", "geom_wkb": rings_to_wkb([_rect(0, 0, 10, 10)])},
                {"ref_id": "rB", "geom_wkb": rings_to_wkb([_rect(10, 0, 20, 10)])},
            ]
        )
    )
    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": "A", "geom_wkb": rings_to_wkb([_rect(0.3, 0.2, 10.4, 9.7)])},
                {"theme_id": "B", "geom_wkb": rings_to_wkb([_rect(10.4, 0.2, 19.6, 9.7)])},
            ]
        )
    )
    out = {
        r.theme_id: rings_from_wkb(r.result_wkb)
        for r in align_network(spark, th, ref, relevant_distance=2.0).collect()
    }
    a, b = out["A"], out["B"]
    assert rings_area(a) > 0 and rings_area(b) > 0
    # no overlap between the aligned neighbours...
    assert area_of_op(a, b, "intersection") == pytest.approx(0.0, abs=1e-6)
    # ...and no gap: the union is a single connected polygon
    union = boolean_op(a + b, [], "union")
    assert len(_group_polygons(union)) == 1
    # both sides of the shared border snapped onto the reference edge x=10
    ax = max(v[0] for ring in a for v in ring)
    bx = min(v[0] for ring in b for v in ring)
    assert ax == pytest.approx(10.0, abs=0.02)
    assert bx == pytest.approx(10.0, abs=0.02)


def test_network_align_multipolygon_parts_stay_adjacent(spark):
    # one feature whose two parts share a border (the dossier shape):
    # the shared border must stay shared after alignment
    parts = [_rect(0.3, 0.2, 10.4, 9.7), _rect(10.4, 0.2, 19.6, 9.7)]
    th = spark.createDataFrame(
        pd.DataFrame([{"theme_id": "D", "geom_wkb": rings_to_wkb(parts)}])
    )
    ref = spark.createDataFrame(
        pd.DataFrame(
            [
                {"ref_id": "rA", "geom_wkb": rings_to_wkb([_rect(0, 0, 10, 10)])},
                {"ref_id": "rB", "geom_wkb": rings_to_wkb([_rect(10, 0, 20, 10)])},
            ]
        )
    )
    row = align_network(spark, th, ref, relevant_distance=2.0).collect()[0]
    res = rings_from_wkb(row.result_wkb)
    assert len(_group_polygons(res)) == 1  # parts merged seamlessly (no gap)
    assert row.n_snapped > 0


def test_processor_dispatch(spark):
    """A2: get_processor_by_id analogue routes ids to kernels; unknown
    ids fall back to the default aligner (brdrq_utils.py:217-220);
    the Dieussaert id is ROUTED like the reference dispatch does
    (brdrq_utils.py:223 — even though the UI enum comments it out at
    :106) and runs the default kernel as a documented stand-in with a
    per-row remark, since its math is brdr-internal."""
    from brdrq_spark.operators.network import (
        PROCESSOR_ALIGNER,
        PROCESSOR_DIEUSSAERT,
        PROCESSOR_NETWORK,
        PROCESSOR_SNAP,
        PROCESSOR_TOPOLOGY,
        align_with_processor,
    )

    ref = spark.createDataFrame(
        pd.DataFrame([{"ref_id": "r", "geom_wkb": rings_to_wkb([_rect(0, 0, 10, 10)])}])
    )
    th = spark.createDataFrame(
        pd.DataFrame(
            [{"theme_id": "t", "geom_wkb": rings_to_wkb([_rect(0.4, 0.3, 10.2, 9.8)])}]
        )
    )
    # dispatch parity over ALL five reference ids + the unknown-id
    # fallback (A2 complete)
    for pid, col in [
        (PROCESSOR_SNAP, "n_snapped"),
        (PROCESSOR_NETWORK, "n_snapped"),
        (PROCESSOR_TOPOLOGY, "n_shared_edges"),
        (PROCESSOR_ALIGNER, "brdr_full_actual"),
        (PROCESSOR_DIEUSSAERT, "brdr_full_actual"),
        ("bogus-id", "brdr_full_actual"),
    ]:
        out = align_with_processor(spark, th, ref, processor_id=pid, relevant_distance=2.0)
        assert col in out.columns
        row = out.collect()[0]
        assert rings_area(rings_from_wkb(row.result_wkb)) == pytest.approx(100.0, rel=0.02)
        if pid == PROCESSOR_DIEUSSAERT:
            assert "dieussaert->aligner stand-in" in row.brdr_remark
        elif "brdr_remark" in out.columns and pid == PROCESSOR_ALIGNER:
            assert "dieussaert" not in (row.brdr_remark or "")


def test_topology_shared_border_bit_identical(spark):
    """The common border of two adjacent themes is computed ONCE (one
    distinct edge key) and both reassembled results contain the exact
    parcel boundary — sym-diff vs the parcel is exactly 0 on both sides,
    independent of input partitioning."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_from_wkb
    from brdrq_spark.geom.clip import boolean_op_multi
    from brdrq_spark.geom import rings_area, rings_to_wkb
    from brdrq_spark.operators.topology import align_topology

    def sq(x0, w=10.0):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + w, 0.0], [x0 + w, 10.0], [x0, 10.0]])]
        )

    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": "a", "geom_wkb": sq(0.25)},
                {"theme_id": "b", "geom_wkb": sq(10.25)},
            ]
        )
    )
    ref = spark.createDataFrame(
        pd.DataFrame(
            [
                {"ref_id": "ra", "geom_wkb": sq(0.0)},
                {"ref_id": "rb", "geom_wkb": sq(10.0)},
            ]
        )
    )
    for parts in (1, 7):
        out = {
            r.theme_id: r
            for r in align_topology(
                spark, th.repartition(parts), ref, relevant_distance=1.0,
                broadcast_ref=True,
            ).collect()
        }
        assert out["a"].n_shared_edges == 1 and out["b"].n_shared_edges == 1
        for tid, x0 in (("a", 0.0), ("b", 10.0)):
            got = rings_from_wkb(out[tid].result_wkb)
            exp = rings_from_wkb(sq(x0))
            dp, dm = boolean_op_multi(got, exp, ("difference", "rdifference"))
            assert rings_area(dp) + rings_area(dm) == 0.0
            assert abs(out[tid].brdr_area - 100.0) < 1e-9


def test_topology_empty_theme_keeps_row(spark):
    """One-row-per-theme contract: a theme whose WKB decodes to no
    rings still reports an explicit no_geometry row. This rides the
    decompose sentinel (no anti-join / extra decompose pass — the plan
    stays at 2 joins), so pin both the row and the normal neighbor."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.topology import align_topology

    ring = np.array([[0.3, 0.0], [10.3, 0.0], [10.3, 10.0], [0.3, 10.0]])
    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": "ok", "geom_wkb": rings_to_wkb([ring])},
                {"theme_id": "hollow", "geom_wkb": rings_to_wkb([])},
            ]
        )
    )
    ref = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "ref_id": "r",
                    "geom_wkb": rings_to_wkb(
                        [np.array([[0.0, 0.0], [10, 0], [10, 10], [0, 10]])]
                    ),
                }
            ]
        )
    )
    out = {
        r.theme_id: r
        for r in align_topology(
            spark, th, ref, relevant_distance=1.0, broadcast_ref=True
        ).collect()
    }
    assert set(out) == {"ok", "hollow"}
    assert out["hollow"].brdr_remark == "no_geometry"
    assert out["hollow"].brdr_area == 0.0 and out["hollow"].n_edges == 0
    assert abs(out["ok"].brdr_area - 100.0) < 1e-9 and out["ok"].brdr_remark == ""


def test_topology_processor_dispatch(spark):
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.network import (
        PROCESSOR_TOPOLOGY,
        align_with_processor,
    )

    ring = np.array([[0.3, 0.0], [10.3, 0.0], [10.3, 10.0], [0.3, 10.0]])
    pr = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    th = spark.createDataFrame(
        pd.DataFrame([{"theme_id": "t", "geom_wkb": rings_to_wkb([ring])}])
    )
    ref = spark.createDataFrame(
        pd.DataFrame([{"ref_id": "r", "geom_wkb": rings_to_wkb([pr])}])
    )
    out = align_with_processor(
        spark, th, ref, processor_id=PROCESSOR_TOPOLOGY, relevant_distance=1.0,
        broadcast_ref=True,
    ).collect()
    assert len(out) == 1 and abs(out[0].brdr_area - 100.0) < 1e-9


def test_dossier_network_fixture(spark):
    """The reference's own dossier GeoJSON through the network processor
    (plugin/brdrq/test/test_autocorrectborders.py:420-463 scenario, rd=10
    over a deterministic synthetic parcel grid). Was a queries() entry
    through round 4; the oracle slot went to network_closed_form, so the
    S1-scan + real-geometry path is pinned here instead."""
    import __spark_entry__ as em

    rows = em.q_align_dossier_network(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.brdr_relevant_distance == 10.0
        assert r.n_snapped > 0 and r.n_snapped <= r.n_vertices
        assert 0.0 < r.max_move <= 10.0
        assert r.brdr_nr_references >= 1
        assert r.brdr_area > 0.0
