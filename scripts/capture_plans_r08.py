"""Capture .explain("formatted") for the round-8 optimization targets
into plans/r08/<name>_<tag>.txt (tag = before/after).

Usage: python scripts/capture_plans_r08.py before|after
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r08")
SF = "/root/testdata/sf0.1"


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    import tempfile

    import bench
    import __spark_entry__ as em
    from brdrq_spark.session import get_spark

    spark = get_spark("plans_r08", cpus=8)
    work = tempfile.mkdtemp(prefix="brdrq_plans_")
    paths = bench.prepare_inputs(spark, work)

    from pyspark.sql import functions as F

    from brdrq_spark.operators.align import AlignConfig, align
    from brdrq_spark.operators.evaluate import evaluate

    ref = spark.read.parquet(paths["ref"])
    th = spark.read.parquet(paths["theme"])

    plans = {}
    plans["align_rd2"] = align(
        spark, th, ref, AlignConfig(relevant_distances=[2.0]), broadcast_ref=True
    )
    th32 = th.where(F.pmod(F.xxhash64("theme_id"), F.lit(32)) == 0)
    plans["evaluate_sweep"] = evaluate(
        spark, th32, ref, max_rd=5.0, step=0.1, auto_step=True, broadcast_ref=True
    )

    qs = em.queries()
    for name in (
        "tpch_q1_pricing_summary",
        "g1_revenue_per_nation",
        "w1_stability_runs",
        "dedup_exact",
        "minhash_lsh_candidates",
        "similarity_cosine",
        "token_counts",
        "evaluate_closed_form",
    ):
        plans[name] = qs[name](spark, SF)
    plans["footprints"] = __import__(
        "brdrq_spark.operators.footprints", fromlist=["extract_footprints"]
    ).extract_footprints(spark.read.parquet(paths["images"]))

    for name, df in plans.items():
        p = os.path.join(OUT, f"{name}_{TAG}.txt")
        with open(p, "w") as f:
            f.write(formatted(df))
        print(f"wrote {p}")

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
