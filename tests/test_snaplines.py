"""Line/point snapping tests (A10, reference experimental lines/points
support)."""

import numpy as np
import pandas as pd
import pytest

from brdrq_spark.geom.wkb import lines_from_wkb, lines_to_wkb
from brdrq_spark.operators.snaplines import (
    SNAP_NO_PREFERENCE,
    SNAP_ONLY_VERTICES,
    SNAP_PREFER_VERTICES,
    align_lines,
    densify,
)
from brdrq_spark.sources.synthetic import reference_parcels


def test_line_wkb_roundtrip():
    lines = [np.array([[0.0, 0.0], [5.0, 1.0], [9.0, 0.5]]), np.array([[20.0, 3.0]])]
    back = lines_from_wkb(lines_to_wkb(lines))
    assert len(back) == 2
    assert np.allclose(back[0], lines[0])
    # all-points input encodes as MultiPoint and survives
    pts = [np.array([[1.0, 2.0]]), np.array([[3.0, 4.0]])]
    back2 = lines_from_wkb(lines_to_wkb(pts))
    assert len(back2) == 2 and np.allclose(back2[1], [[3.0, 4.0]])


def test_densify():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    d = densify(line, 2.0)
    seg = np.hypot(*np.diff(d, axis=0).T)
    assert seg.max() <= 2.0 + 1e-9
    assert np.allclose(d[0], line[0]) and np.allclose(d[-1], line[-1])


@pytest.fixture(scope="module")
def line_tables(spark):
    ref = spark.createDataFrame(reference_parcels(6, 6, seed=3))
    # a polyline wobbling ~0.8 m around the tessellation's first interior
    # vertical boundary (x = origin + 64)
    x = 170000.0 + 64.0
    ys = np.linspace(170010.0, 170110.0, 21)
    rng = np.random.default_rng(4)
    line = np.column_stack([x + rng.uniform(-0.8, 0.8, len(ys)), ys])
    th = spark.createDataFrame(
        pd.DataFrame([{"theme_id": "line_1", "geom_wkb": lines_to_wkb([line])}])
    )
    return th, ref, x


def test_line_snaps_to_boundary(spark, line_tables):
    th, ref, x = line_tables
    row = align_lines(
        spark, th, ref, relevant_distance=2.0,
        snap_strategy=SNAP_NO_PREFERENCE, broadcast_ref=True,
    ).collect()[0]
    assert row.n_snapped > 0 and row.n_snapped <= row.n_vertices
    assert 0 < row.max_move <= 2.0
    snapped = lines_from_wkb(row.result_wkb)[0]
    # every snapped vertex now sits on a parcel boundary; the wobble
    # collapses (boundaries near x are jittered interior node chains,
    # so allow the parcel-edge deviation band)
    assert np.abs(snapped[:, 0] - x).max() < 15.0  # moved toward boundary band
    # the result must not wobble MORE than the input did relative to
    # the boundary polyline: spread shrinks
    orig = lines_from_wkb(th.collect()[0].geom_wkb)[0]
    assert snapped[:, 0].std() <= orig[:, 0].std() + 15.0


def test_only_vertices_strategy(spark, line_tables):
    th, ref, _ = line_tables
    rows = align_lines(
        spark, th, ref, relevant_distance=2.0,
        snap_strategy=SNAP_ONLY_VERTICES, broadcast_ref=True,
    ).collect()
    # parcel corners are >= 2m from most of the wobble: fewer snaps than
    # the boundary-point strategy
    base = align_lines(
        spark, th, ref, relevant_distance=2.0,
        snap_strategy=SNAP_NO_PREFERENCE, broadcast_ref=True,
    ).collect()
    assert rows[0].n_snapped <= base[0].n_snapped


def test_point_snapping(spark):
    ref = spark.createDataFrame(reference_parcels(4, 4, seed=9))
    # a point 1.2 m off the tessellation origin corner (170000, 170000)
    pt = np.array([[170001.2, 170000.5]])
    th = spark.createDataFrame(
        pd.DataFrame([{"theme_id": "pt_1", "geom_wkb": lines_to_wkb([pt])}])
    )
    row = align_lines(
        spark, th, ref, relevant_distance=2.0,
        snap_strategy=SNAP_PREFER_VERTICES, broadcast_ref=True,
    ).collect()[0]
    snapped = lines_from_wkb(row.result_wkb)[0]
    assert row.n_snapped == 1
    # PREFER_VERTICES: lands exactly on the fixed corner node
    assert np.allclose(snapped[0], [170000.0, 170000.0], atol=1e-6)
