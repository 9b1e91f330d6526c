"""Coarse-grid snap normalization: re-run the boolean engine with an
effectively coarser snap grid, so slivers/gaps thinner than the grid
collapse in one pass — the cheap equivalent of morphological
closing+opening at the correction distance (reference
correction_distance=0.01 m,
plugin/brdrq/brdrq_algorithm_autocorrectborders.py:193)."""

from __future__ import annotations

import numpy as np

from brdrq_spark.geom.clip import boolean_op
from brdrq_spark.geom.core import SNAP, snap_ring


def snap_normalize(rings: list[np.ndarray], grid: float) -> list[np.ndarray]:
    """Normalize `rings` with vertices snapped to `grid` meters.

    Implemented by scaling into the engine's native snap resolution:
    coordinates divided by (grid/SNAP) make the engine's 1e-6 snap act
    as a `grid`-sized lattice, then scaled back.
    """
    if not rings or grid <= SNAP:
        return boolean_op(rings, [], "union")
    s = grid / SNAP
    scaled = [r / s for r in rings]
    out = boolean_op(scaled, [], "union")
    # re-snap to the engine grid so WKB round-trips are exact
    return [snap_ring(r * s) for r in out]
