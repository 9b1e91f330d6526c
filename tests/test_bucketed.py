"""Cell-bucketed layer storage: the repeated-join shuffle eliminator."""

import io
from contextlib import redirect_stdout

from brdrq_spark.operators.candidates import candidate_pairs
from brdrq_spark.sources.bucketed import bucketed_candidate_pairs, write_cell_indexed
from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons


def test_bucketed_join_no_exchange_and_same_pairs(spark):
    ref = spark.createDataFrame(reference_parcels(8, 8, seed=5))
    th = spark.createDataFrame(thematic_polygons(16, 8, 8, seed=5, jitter=1.0))
    write_cell_indexed(
        th, "t_cells_bkt", "theme_id", max_rd=2.0, dilate=2.0 * 2.0 * 1.01, buckets=8
    )
    write_cell_indexed(ref, "r_cells_bkt", "ref_id", max_rd=2.0, buckets=8)

    pairs_df = bucketed_candidate_pairs(
        spark, "t_cells_bkt", "r_cells_bkt", max_rd=2.0, join_hint="merge"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        pairs_df.explain("formatted")
    plan = buf.getvalue().split("\n(1) ")[0]
    # the join itself consumes the bucketing: no shuffle on either input
    # (the final distinct() aggregates on different keys and may shuffle)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning(cell" not in plan, plan

    got = {(r.theme_id, r.ref_id) for r in pairs_df.collect()}
    want = {
        (r.theme_id, r.ref_id)
        for r in candidate_pairs(th, ref, max_rd=2.0, broadcast_ref=False).collect()
    }
    assert got == want and len(want) > 16
