"""One-off 10x robustness probe (round-7 VERDICT item 4): run the
align job at ~10x the scaling workload (122 jitter replicas = 499,712
themes, local[32]) and record wall time plus PEAK MEMORY of the python
driver AND the JVM, evidencing that no driver-side structure grows
with data — candidate generation, hot-cell thresholding, admission
control and lineage all operate in-DAG (the reference's own
scalability advice stops at "use a spatial index", docs/qa.qmd:19-40).

Usage: python scripts/probe_10x.py [N_REPLICAS] [CPUS]
Prints one JSON line; the reading is recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = 64


def _jvm_peak_mb() -> float | None:
    """VmHWM of the spark-submit JVM child (the driver's other half)."""
    me = os.getpid()
    best = None
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) != me:  # ppid
                continue
            with open(f"/proc/{pid}/comm") as f:
                if "java" not in f.read():
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        best = int(line.split()[1]) / 1024.0
        except (OSError, ValueError, IndexError):
            continue
    return best


def main() -> None:
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 122
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import pandas as pd

    from brdrq_spark.operators.align import AlignConfig, align
    from brdrq_spark.session import get_spark
    from brdrq_spark.sources.synthetic import (
        reference_parcels,
        thematic_polygons,
    )

    spark = get_spark("probe_10x", cpus=cpus)
    work = tempfile.mkdtemp(prefix="probe10x_")
    theme_path = f"{work}/themes.parquet"
    # generate in chunks so the probe itself doesn't hold 122 replicas
    # in one pandas frame (the WORKLOAD must scale; the generator is
    # allowed to stream)
    for k0 in range(0, n_rep, 16):
        chunk = pd.concat(
            [
                thematic_polygons(
                    GRID * GRID, GRID, GRID, seed=42 + k, jitter=1.0,
                    node_seed=42,
                ).assign(theme_id=lambda d, k=k: d.theme_id + f"_r{k}")
                for k in range(k0, min(k0 + 16, n_rep))
            ],
            ignore_index=True,
        )
        spark.createDataFrame(chunk).repartition(cpus).write.mode(
            "append"
        ).parquet(theme_path)
    ref = spark.createDataFrame(reference_parcels(GRID, GRID, seed=42))
    th = spark.read.parquet(theme_path)
    cfg = AlignConfig(relevant_distances=[2.0])
    align(spark, th.limit(8 * cpus), ref, cfg, broadcast_ref=True).count()
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    t0 = time.time()
    n = align(spark, th, ref, cfg, broadcast_ref=True).count()
    dt = time.time() - t0
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    print(
        json.dumps(
            {
                "themes": int(th.count()),
                "aligned_rows": n,
                "wall_sec": round(dt, 1),
                "themes_per_sec": round(n / dt, 1),
                "py_driver_peak_mb": round(rss_after, 1),
                "py_driver_peak_before_mb": round(rss_before, 1),
                "jvm_peak_mb": _jvm_peak_mb(),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
