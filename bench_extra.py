"""Round-8 iteration harness (NOT the driver bench — bench.py is frozen).

Reuses bench.py's exact input preparation and timing methodology
(full-size untimed warm pass, then median-of-3) for the headline
queries, but skips the ~30-minute scaling loop so optimization
iterations are fast. Also offers per-stage isolation for the align /
evaluate_sweep paths via the noop sink (guide §1.4).

Usage:
  python bench_extra.py                 # all headline queries
  python bench_extra.py align_rd2 evaluate_sweep
  python bench_extra.py --census       # per-stage breakdown of the
                                       # align + sweep paths
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen harness: reuse inputs + methodology)

ALL = (
    "align_rd2",
    "footprints",
    "evaluate_sweep",
    "tpch_q1_pricing_summary",
    "g1_revenue_per_nation",
    "w1_stability_runs",
    "dedup_exact",
    "minhash_lsh_candidates",
    "similarity_cosine",
    "token_counts",
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def census(spark, paths) -> dict:
    """Per-stage breakdown of the align/sweep paths (guide §1.1/1.4):
    candidate subtree alone (noop sink), kernel stage on top, and the
    sweep's own stages. Times are medians of 3 after a warm pass."""
    from pyspark.sql import functions as F

    from brdrq_spark.operators.align import AlignConfig, align, align_candidate_rows

    out: dict[str, float] = {}
    ref = spark.read.parquet(paths["ref"])
    th = spark.read.parquet(paths["theme"])

    spark.sparkContext.setJobDescription("census: align candidate subtree")
    cfg = AlignConfig(relevant_distances=[2.0])
    grouped, _res = align_candidate_rows(spark, th, ref, cfg, broadcast_ref=True)
    noop(grouped)
    t, _ = bench.timed_median(lambda: noop(grouped))
    out["align_candidates_noop"] = round(t, 3)

    spark.sparkContext.setJobDescription("census: align full")
    align(spark, th, ref, cfg, broadcast_ref=True).count()
    t, _ = bench.timed_median(
        lambda: align(spark, th, ref, cfg, broadcast_ref=True).count()
    )
    out["align_full"] = round(t, 3)

    # sweep slice (the bench's evaluate_sweep theme set)
    th32 = th.where(F.pmod(F.xxhash64("theme_id"), F.lit(32)) == 0)
    sw_cfg = AlignConfig(relevant_distances=[5.0])
    spark.sparkContext.setJobDescription("census: sweep candidate subtree")
    grouped2, _res2 = align_candidate_rows(
        spark, th32, ref, sw_cfg, broadcast_ref=True
    )
    noop(grouped2)
    t, _ = bench.timed_median(lambda: noop(grouped2))
    out["sweep_candidates_noop"] = round(t, 3)

    from brdrq_spark.operators.evaluate import evaluate

    spark.sparkContext.setJobDescription("census: evaluate_sweep full")
    evaluate(
        spark, th32, ref, max_rd=5.0, step=0.1, auto_step=True, broadcast_ref=True
    ).count()
    t, _ = bench.timed_median(
        lambda: evaluate(
            spark, th32, ref, max_rd=5.0, step=0.1, auto_step=True,
            broadcast_ref=True,
        ).count()
    )
    out["evaluate_sweep_full"] = round(t, 3)
    spark.sparkContext.setJobDescription(None)
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_census = "--census" in sys.argv
    names = tuple(args) or ALL
    from brdrq_spark.session import get_spark

    results: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="brdrq_benchx_")
    try:
        spark = get_spark("bench_extra", cpus=bench.CPUS)
        paths = bench.prepare_inputs(spark, work)

        if do_census:
            print(json.dumps({"census": census(spark, paths)}))
            return

        runners = {
            "align_rd2": lambda: bench.run_align(spark, paths),
            "footprints": lambda: bench.run_footprints(spark, paths),
            "evaluate_sweep": lambda: bench.run_evaluate_sweep(spark, paths),
        }
        import __spark_entry__ as em

        qs = em.queries()
        t0 = time.time()
        if "align_rd2" in names:
            bench.run_align(spark, paths)  # full-size warm pass
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            if name in runners:
                t, _ = bench.timed_median(runners[name])
            else:
                fn = qs[name]
                t, _ = bench.timed_median(
                    lambda f=fn: f(spark, bench.SF_DIR).count()
                )
            results[name] = round(t, 3)
        print(
            json.dumps(
                {
                    "metric": "bench_extra (no scaling loop)",
                    "value": round(sum(results.values()), 3),
                    "unit": "sec",
                    "queries": results,
                    "sf": bench.SF,
                    "wall": round(time.time() - t0, 1),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
