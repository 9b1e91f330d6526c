"""Scaling decomposition probe: times the align job's phases at one
parallelism level, in a fresh JVM. Run twice (e.g. 4 and 16 cores) and
compare to locate the non-scaling component.

Usage: python scripts/probe_scaling.py CPUS [N_THEMES] [--shuffle]
Inputs are cached in /tmp/brdrq_scaleprobe (generated on first use).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/brdrq_scaleprobe"
GRID = 64


def ensure_inputs(spark, n_themes: int) -> dict:
    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    paths = {
        "ref": f"{ROOT}/reference.parquet",
        "theme": f"{ROOT}/thematic_{n_themes}.parquet",
    }
    if not os.path.exists(paths["ref"]):
        spark.createDataFrame(reference_parcels(GRID, GRID, seed=42)).repartition(
            32
        ).write.mode("overwrite").parquet(paths["ref"])
    if not os.path.exists(paths["theme"]):
        import pandas as pd

        reps = []
        base = n_themes
        k = 0
        while base > 0:
            take = min(base, GRID * GRID)
            reps.append(
                thematic_polygons(
                    take, GRID, GRID, seed=42 + k, jitter=1.0, node_seed=42
                ).assign(theme_id=lambda d, k=k: d.theme_id + f"_r{k}")
            )
            base -= take
            k += 1
        pdf = pd.concat(reps, ignore_index=True)
        spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(
            paths["theme"]
        )
    return paths


def main():
    cpus = int(sys.argv[1])
    n_themes = int(sys.argv[2]) if len(sys.argv) > 2 else GRID * GRID
    broadcast = "--shuffle" not in sys.argv

    from brdrq_spark.operators.align import AlignConfig, align, align_candidate_rows
    from brdrq_spark.session import get_spark

    spark = get_spark(f"probe_{cpus}", cpus=cpus)
    paths = ensure_inputs(spark, n_themes)
    ref = spark.read.parquet(paths["ref"])
    th = spark.read.parquet(paths["theme"])
    cfg = AlignConfig(relevant_distances=[2.0])

    # warm-up: full align on a prefix
    align(spark, th.limit(8 * cpus), ref, cfg, broadcast_ref=broadcast).count()

    def best3(fn):
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return round(min(ts), 3), [round(t, 3) for t in ts]

    out = {"cpus": cpus, "n_themes": n_themes, "broadcast": broadcast}

    # phase A: ref-side cover UDF + explode only
    from brdrq_spark.operators.candidates import with_geo_features
    from pyspark.sql import functions as F

    r_cells = with_geo_features(ref.select("ref_id", "geom_wkb"), "geom_wkb", 10, 0.0)
    out["ref_prep"], out["ref_prep_all"] = best3(lambda: r_cells.count())

    # phase B: full candidate plan (cover UDFs both sides + join + union)
    grouped, _res = align_candidate_rows(spark, th, ref, cfg, broadcast_ref=broadcast)
    out["cand_plan"], out["cand_plan_all"] = best3(lambda: grouped.count())

    # phase C: candidate plan + repartition/sort (no kernel)
    par = spark.sparkContext.defaultParallelism
    parts = grouped.repartition(par * 4, "theme_id").sortWithinPartitions("theme_id")
    out["cand_sorted"], out["cand_sorted_all"] = best3(lambda: parts.count())

    # phase D: full align
    full = lambda: align(spark, th, ref, cfg, broadcast_ref=broadcast).count()
    out["full_align"], out["full_align_all"] = best3(full)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
