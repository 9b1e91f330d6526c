"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., "throughput_rows_per_sec": ..., "scaling": {...}}

Scaling evidence (BASELINE.md sandbox protocol): the same align job runs
at two parallelism levels (cpus/4 and cpus) on identical input;
efficiency = throughput(4N) / (4 * throughput(N)).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from brdrq_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1

# align workload size scales with sf: sf0.1 -> 1200 themes on a 64x64
# parcel grid; sf0.01 -> 120
N_THEMES = max(24, int(12000 * SF))
GRID = 64


def timed(fn):
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def build_align_inputs(spark):
    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    ref = spark.createDataFrame(reference_parcels(GRID, GRID, seed=42))
    th = spark.createDataFrame(
        thematic_polygons(min(N_THEMES, GRID * GRID), GRID, GRID, seed=42, jitter=1.0)
    )
    # themes beyond the grid capacity: tile extra jittered copies
    return th, ref


def run_align(spark, n_themes: int):
    from brdrq_spark.operators.align import AlignConfig, align
    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    ref = spark.createDataFrame(reference_parcels(GRID, GRID, seed=42))
    th = spark.createDataFrame(
        thematic_polygons(min(n_themes, GRID * GRID), GRID, GRID, seed=42, jitter=1.0)
    ).repartition(CPUS * 2)
    out = align(spark, th, ref, AlignConfig(relevant_distances=[2.0]), broadcast_ref=True)
    return out.count()


def main():
    results: dict[str, float] = {}
    spark = get_spark("bench", cpus=CPUS)

    # --- headline: align pipeline ---------------------------------------
    t_align, n_aligned = timed(lambda: run_align(spark, N_THEMES))
    results["align_rd2"] = round(t_align, 3)

    # --- footprints -------------------------------------------------------
    def run_footprints():
        from brdrq_spark.operators.footprints import extract_footprints
        from brdrq_spark.sources.synthetic import images_table

        images = spark.createDataFrame(images_table(max(50, int(2000 * SF)), seed=42))
        return extract_footprints(images).count()

    t_fp, n_fp = timed(run_footprints)
    results["footprints"] = round(t_fp, 3)

    # --- relational headliners at sf_dir ---------------------------------
    import __spark_entry__ as em

    for name in (
        "tpch_q1_pricing_summary",
        "g1_revenue_per_nation",
        "w1_stability_runs",
        "dedup_exact",
        "minhash_lsh_candidates",
        "similarity_cosine",
        "token_counts",
    ):
        fn = em.queries()[name]
        t, _ = timed(lambda f=fn: f(spark, SF_DIR).count())
        results[name] = round(t, 3)

    total = sum(results.values())
    align_throughput = n_aligned / t_align if t_align > 0 else 0.0

    # --- scaling evidence: same align job at N and 4N threads ------------
    spark.stop()
    scaling = {}
    n_scale = min(max(200, int(4000 * SF)), GRID * GRID)
    lo = max(CPUS // 4, 1)
    for c in (lo, CPUS):
        global CPUS_CUR
        s = get_spark(f"bench_scale_{c}", cpus=c)
        t, n = timed(lambda: run_align(s, n_scale))
        scaling[f"local[{c}]"] = {
            "sec": round(t, 3),
            "rows_per_sec": round(n / t, 2),
        }
        s.stop()
    thr_lo = scaling[f"local[{lo}]"]["rows_per_sec"]
    thr_hi = scaling[f"local[{CPUS}]"]["rows_per_sec"]
    eff = thr_hi / ((CPUS / lo) * thr_lo) if thr_lo > 0 else 0.0
    scaling["efficiency"] = round(eff, 3)
    scaling["n_over_4n"] = f"local[{lo}] -> local[{CPUS}]"

    print(
        json.dumps(
            {
                "metric": "brdrq_spark headline suite (align+footprints+relational)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": results,
                "sf": SF,
                "align_rows": n_aligned,
                "align_rows_per_sec": round(align_throughput, 2),
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
