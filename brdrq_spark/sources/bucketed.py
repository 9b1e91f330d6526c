"""Cell-bucketed layer storage: pre-shuffled spatial tables so repeated
candidate joins run with NO exchange on either side.

At 100 TB the reference layer is written once and joined against every
incoming thematic batch; paying its shuffle per job is pure waste.
``write_cell_indexed`` persists the exploded (cell, id, wkb, bbox) form
bucketed by cell (`bucketBy(n, "cell")` + sortBy), so Catalyst plans the
cell equi-join over two such tables as a zero-exchange SortMergeJoin —
the spatial analogue of co-partitioned fact tables. The reference has no
notion of this (single-process QGIS); it is the Spark-native answer to
its per-run GRB re-download (brdrq_algorithm_autocorrectborders.py:598-604).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brdrq_spark.grid import pick_resolution
from brdrq_spark.operators.candidates import cells_exploded


def write_cell_indexed(
    df: DataFrame,
    table: str,
    id_col: str,
    max_rd: float = 2.0,
    res: int | None = None,
    dilate: float = 0.0,
    buckets: int = 64,
    geom_col: str = "geom_wkb",
) -> None:
    """Persist a layer in exploded cell-indexed form, bucketed by cell.

    ``buckets`` should match across every table that will be joined
    (equal bucket counts → zero-exchange join)."""
    if res is None:
        res = pick_resolution(max_rd)
    # single-pass decode+cover+explode (no generator re-evaluating the UDF)
    src = df.select(id_col, F.col(geom_col).alias("geom_wkb"))
    cells = cells_exploded(
        src, id_col, res, dilate, "b", wkb_out=geom_col
    ).select(
        id_col,
        geom_col,
        F.col("b_minx").alias("minx"),
        F.col("b_miny").alias("miny"),
        F.col("b_maxx").alias("maxx"),
        F.col("b_maxy").alias("maxy"),
        "cell",
    )
    (
        cells.write.mode("overwrite")
        .bucketBy(buckets, "cell")
        .sortBy("cell")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_candidate_pairs(
    spark: SparkSession,
    theme_table: str,
    ref_table: str,
    max_rd: float,
    theme_id: str = "theme_id",
    ref_id: str = "ref_id",
    join_hint: str | None = None,
) -> DataFrame:
    """Candidate pairs over two cell-bucketed tables — the join consumes
    the bucketing, so neither side shuffles (verify with .explain: no
    Exchange above either scan). ``join_hint="merge"`` forces the
    sort-merge plan when the table is small enough that Catalyst would
    broadcast instead (tests; at 100 TB the choice is automatic)."""
    t = spark.table(theme_table).select(
        theme_id,
        F.col("minx").alias("t_minx"),
        F.col("miny").alias("t_miny"),
        F.col("maxx").alias("t_maxx"),
        F.col("maxy").alias("t_maxy"),
        "cell",
    )
    r = spark.table(ref_table).select(
        ref_id,
        F.col("minx").alias("r_minx"),
        F.col("miny").alias("r_miny"),
        F.col("maxx").alias("r_maxx"),
        F.col("maxy").alias("r_maxy"),
        "cell",
    )
    dx = F.greatest(
        F.col("t_minx") - F.col("r_maxx"), F.col("r_minx") - F.col("t_maxx"), F.lit(0.0)
    )
    dy = F.greatest(
        F.col("t_miny") - F.col("r_maxy"), F.col("r_miny") - F.col("t_maxy"), F.lit(0.0)
    )
    if join_hint:
        r = r.hint(join_hint)
    return (
        t.join(r, "cell")
        .where(F.sqrt(dx * dx + dy * dy) <= F.lit(2.0 * max_rd))
        .select(theme_id, ref_id)
        .distinct()
    )
