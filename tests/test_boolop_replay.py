"""Committed boolean-engine replay pin (VERDICT r7 item 2).

The boolean engine (geom/clip.py) has been rewritten three rounds
running; its only full-workload-distribution pin used to live in /tmp
(scripts/replay_boolop.py). This test replays a committed, stratified
sample of the real align-kernel call stream — both the 51-rd sweep and
single-rd shapes, every op in clip._OPS, small/medium/large size
buckets, scalar AND capsule-block inputs — and requires ring-level
bit-identical outputs. Regenerate the fixture ONLY for a deliberate,
justified semantic change: scripts/capture_replay_fixture.py.
"""

import os

import numpy as np

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "boolop_replay.npz"
)


def test_boolop_replay_bit_identical():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.capture_replay_fixture import decode
    from brdrq_spark.geom.clip import boolean_op

    calls = decode(FIXTURE)
    assert len(calls) >= 80  # both shapes, all strata present
    ops_seen = set()
    bad = []
    for k, (a, b, op, want) in enumerate(calls):
        ops_seen.add(op)
        got = boolean_op(a, b, op)
        if len(got) != len(want) or any(
            g.shape != w.shape or not np.array_equal(g, w)
            for g, w in zip(got, want)
        ):
            bad.append((k, op))
    assert not bad, f"bit-mismatches at {bad[:5]} (total {len(bad)})"
    assert {"union", "intersection", "difference", "rdifference", "symdiff"} <= ops_seen
