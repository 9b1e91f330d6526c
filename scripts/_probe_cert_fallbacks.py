"""One-off: census the erode_nonempty fallbacks — would the tighter
star-shaped NONEMPTY certificate (removal <= d*perim + nv*pi*d^2 for a
single simple CCW ring, simplicity certified by star-shapedness from the
vertex centroid) settle them?  Not part of the driver contract."""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from scripts.profile_kernel import build_jobs


def star_shaped_ccw(ring: np.ndarray) -> bool:
    c = ring.mean(axis=0)
    v = ring - c
    v2 = np.roll(v, -1, axis=0)
    cross = v[:, 0] * v2[:, 1] - v[:, 1] * v2[:, 0]
    return bool((cross > 0).all())


def main():
    n_themes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    jobs = build_jobs(n_themes)

    from brdrq_spark.operators.align import AlignConfig, _make_kernel
    from brdrq_spark.geom import buffer as gbuf

    kern = _make_kernel(AlignConfig(relevant_distances=[2.0]), 10)

    stats = Counter()
    t_fallback = [0.0]
    orig = gbuf.erode_nonempty
    orig_area = gbuf.erode_area

    M = gbuf._CERT_MARGIN
    TINY = gbuf._TINY

    def spy(rings, d, nseg=16):
        # replicate the scalar sums the cert computes
        if not rings or d <= 0:
            return orig(rings, d, nseg)
        area = 0.0
        perim = 0.0
        nv = 0
        ok = True
        for ring in rings:
            if ring.ndim != 2 or len(ring) < 3:
                ok = False
                break
            x = ring[:, 0]; y = ring[:, 1]
            a = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            area += a
            dx = np.roll(x, -1) - x
            dy = np.roll(y, -1) - y
            perim += float(np.hypot(dx, dy).sum())
            nv += len(ring)
        out = orig(rings, d, nseg)
        if not ok:
            stats["degenerate"] += 1
            return out
        # did the EXISTING certs fire?  re-run decision logic shape:
        old_nonempty = area - 2.0 * d * perim - nv * np.pi * d * d > TINY + M
        if old_nonempty:
            stats["old_nonempty_fired"] += 1
            return out
        # cheap emulation: the old EMPTY cert outcome == out is False and
        # table wasn't built — can't observe directly; instead classify by
        # whether a table build happened via timing of orig? Simpler: count
        # every call that is NOT settled by old NONEMPTY, then classify.
        single = len(rings) == 1
        star = single and star_shaped_ccw(rings[0])
        new_fire = star and (area - d * perim - nv * np.pi * d * d > TINY + M)
        # tighter-still variant: collar bound d*perim - pi*d^2 (simple ring)
        new_fire2 = star and (area - d * perim + np.pi * d * d > TINY + M)
        key = (
            f"fall_single={single}_star={star}_out={out}"
        )
        stats[key] += 1
        if new_fire:
            stats["new_cert_would_fire"] += 1
            if not out:
                stats["NEW_CERT_WRONG"] += 1
        if new_fire2:
            stats["new_cert2_would_fire"] += 1
            if not out:
                stats["NEW_CERT2_WRONG"] += 1
        return out

    gbuf.erode_nonempty = spy
    # the align kernel may import the symbol directly; patch there too
    import brdrq_spark.operators.align as al
    had = getattr(al, "erode_nonempty", None)
    if had is not None:
        al.erode_nonempty = spy
    import brdrq_spark.geom as geom_pkg
    if hasattr(geom_pkg, "erode_nonempty"):
        geom_pkg.erode_nonempty = spy

    t0 = time.time()
    for tw, cands in jobs:
        kern(pd.DataFrame({"theme_id": ["t"] * max(len(cands), 1),
                           "theme_wkb": [tw] * max(len(cands), 1),
                           "ref_wkb": cands or [None]}))
    dt = time.time() - t0
    print(f"run: {dt:.2f}s  ({n_themes/dt:.1f} themes/s, instrumented)")
    for k, v in sorted(stats.items()):
        print(f"  {k:50s} {v}")


if __name__ == "__main__":
    main()
