"""Kernel hot-path census: run the align kernel over the bench theme
workload in-process (no Spark), under cProfile, and count _trap_table
calls by size and by call site. Guides perf work; not part of the
driver contract.

Usage: python scripts/profile_kernel.py [N_THEMES]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def build_jobs(n_themes: int):
    from brdrq_spark.geom import bbox as gbbox, bbox_distance, rings_from_wkb
    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    GRID = 64
    ref = reference_parcels(GRID, GRID, seed=42)
    th = thematic_polygons(n_themes, GRID, GRID, seed=42, jitter=1.0)
    refboxes = [(w, gbbox(rings_from_wkb(w))) for w in ref.geom_wkb]
    jobs = []
    for k in range(len(th)):
        tb = gbbox(rings_from_wkb(th.geom_wkb.iloc[k]))
        cands = [w for w, bb in refboxes if bbox_distance(tb, bb) <= 4.04]
        jobs.append((th.geom_wkb.iloc[k], cands))
    return jobs


def main():
    n_themes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    jobs = build_jobs(n_themes)

    from brdrq_spark.operators.align import AlignConfig, _make_kernel
    from brdrq_spark.geom import clip

    kern = _make_kernel(AlignConfig(relevant_distances=[2.0]), 10)

    # --- census instrumentation -------------------------------------------
    sizes = Counter()   # bucketed raw-vertex counts per table build
    sites = Counter()   # caller function names
    t_by_site: Counter = Counter()
    orig = clip._trap_table

    def spy(a_rings, b_rings):
        nv = 0
        for rings in (a_rings, b_rings):
            for r in rings:
                nv += r.shape[0] * (r.shape[1] if r.ndim == 3 else 1)
        bucket = (
            "<=16" if nv <= 16 else "<=64" if nv <= 64 else
            "<=256" if nv <= 256 else "<=1024" if nv <= 1024 else ">1024"
        )
        sizes[bucket] += 1
        f = sys._getframe(1)
        # walk out of clip.py to the first geom/operator caller
        while f and "clip.py" in f.f_code.co_filename:
            f = f.f_back
        g = f.f_back
        site = f.f_code.co_name
        if g is not None and "buffer.py" in f.f_code.co_filename:
            site = f"{g.f_code.co_name}>{site}"
        t0 = time.perf_counter()
        out = orig(a_rings, b_rings)
        dt = time.perf_counter() - t0
        sites[site] += 1
        t_by_site[site] += dt
        t_by_site["_TOTAL_trap_table"] += dt
        return out

    def run():
        for tw, cands in jobs:
            kern(
                pd.DataFrame(
                    {
                        "theme_id": ["t"] * max(len(cands), 1),
                        "theme_wkb": [tw] * max(len(cands), 1),
                        "ref_wkb": cands or [None],
                    }
                )
            )

    # warm pass for caches / numpy
    for tw, cands in jobs[:8]:
        kern(pd.DataFrame({"theme_id": ["t"] * max(len(cands), 1),
                           "theme_wkb": [tw] * max(len(cands), 1),
                           "ref_wkb": cands or [None]}))

    t0 = time.time()
    run()
    base = time.time() - t0
    print(f"plain run: {base:.3f} s  ({n_themes / base:.1f} themes/s)")

    clip._trap_table = spy
    t0 = time.time()
    run()
    spy_t = time.time() - t0
    clip._trap_table = orig
    print(f"census run: {spy_t:.3f} s; trap_table total "
          f"{t_by_site['_TOTAL_trap_table']:.3f} s "
          f"({100 * t_by_site['_TOTAL_trap_table'] / spy_t:.0f}% of census run)")
    print("table sizes:", dict(sizes), f" per theme={sum(sizes.values())/n_themes:.1f}")
    for site, cnt in sites.most_common():
        print(f"  {site:45s} n={cnt:6d}  t={t_by_site[site]:7.3f}s  "
              f"({t_by_site[site]*1e3/cnt:6.2f} ms/call)")

    pr = cProfile.Profile()
    pr.enable()
    run()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(28)


if __name__ == "__main__":
    main()
