"""Boolean-engine replay harness (the round-7 discipline tool): pin
every ``boolean_op`` output on a captured real-workload call stream,
then verify any engine change reproduces them BIT-FOR-BIT.

The round-6/7 lesson is that probe windows swing ±15% and plausible
rewrites can silently change snap-level output — replaying a captured
stream is the only comparison that is both fast and exact.

Usage:
  python scripts/replay_boolop.py capture /tmp/boolop.pkl   # BEFORE edits
  python scripts/replay_boolop.py check   /tmp/boolop.pkl   # AFTER edits

`capture` drives the align kernel over the bench theme workload in
TWO shapes (a 51-rd sweep and a single-rd pass — their op-size
distributions differ, and a rewrite fast on one has been slow on the
other), records every (a_rings, b_rings, op) triple plus the current
outputs. `check` re-runs the stream on the current code and reports
bit-mismatches (ring-for-ring np.array_equal) and wall time.
"""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

CAP = 3000


def _drive() -> None:
    from scripts.profile_kernel import build_jobs
    from brdrq_spark.operators.align import (
        AlignConfig,
        _make_kernel,
        distance_grid,
    )

    jobs = build_jobs(12)
    for cfg_rds in (distance_grid(2.0, 0.04), [2.0]):
        kern = _make_kernel(AlignConfig(relevant_distances=cfg_rds), 10)
        for tw, cands in jobs[: 6 if len(cfg_rds) > 1 else len(jobs)]:
            n = max(len(cands), 1)
            kern(
                pd.DataFrame(
                    {
                        "theme_id": ["t"] * n,
                        "theme_wkb": [tw] * n,
                        "ref_wkb": cands or [None],
                    }
                )
            )


def capture(path: str) -> None:
    from brdrq_spark.geom import clip as C
    import brdrq_spark.geom.buffer as B
    import brdrq_spark.operators.align as A

    stream: list = []
    orig = C.boolean_op

    def spy(a, b, op):
        if len(stream) < CAP:
            stream.append(
                ([np.array(r) for r in a], [np.array(x) for x in b], op)
            )
        return orig(a, b, op)

    C.boolean_op = B.boolean_op = A.boolean_op = spy
    try:
        _drive()
    finally:
        C.boolean_op = B.boolean_op = A.boolean_op = orig
    outs = [orig(a, b, op) for a, b, op in stream]
    with open(path, "wb") as f:
        pickle.dump((stream, outs), f)
    print(f"captured {len(stream)} calls -> {path}")


def check(path: str) -> None:
    from brdrq_spark.geom.clip import boolean_op

    stream, base = pickle.load(open(path, "rb"))
    for a, b, op in stream[:50]:
        boolean_op(a, b, op)  # warm
    t0 = time.perf_counter()
    outs = [boolean_op(a, b, op) for a, b, op in stream]
    dt = time.perf_counter() - t0
    bad = 0
    for k, (o, bo) in enumerate(zip(outs, base)):
        if len(o) != len(bo) or any(
            r.shape != br.shape or not np.array_equal(r, br)
            for r, br in zip(o, bo)
        ):
            bad += 1
            if bad <= 5:
                print(f"  mismatch at call {k} (op={stream[k][2]})")
    print(
        f"replay: {dt:.3f}s over {len(stream)} calls; "
        f"bit-mismatches: {bad}/{len(outs)}"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    mode, path = sys.argv[1], sys.argv[2]
    {"capture": capture, "check": check}[mode](path)
