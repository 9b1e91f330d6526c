"""Temporal reference update (reference: AutoUpdateBorders /
``update_featurecollection_to_actual_grb``,
plugin/brdrq/brdrq_algorithm_autoupdateborders.py:431-450): re-align only
the thematic features whose referenced parcels changed since the
version_date recorded in their lineage metadata; untouched features pass
through unchanged ("no changes detected" early-exit path ibid.:445-450).

Spark shape: an anti-join of recorded lineage vs the current reference
version table isolates the changed subset — the incremental-recompute
pattern (SURVEY.md O13) — then the ordinary align/evaluate operator runs
on that subset only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brdrq_spark.operators.align import AlignConfig, align


def lineage_from_metadata(
    theme_df: DataFrame, metadata_col: str = "brdr_metadata"
) -> DataFrame:
    """Parse the SOSA actuation lineage the reference embeds per feature
    (fixture plugin/brdrq/test/themelayer_metadata.geojson:
    ``brdr_metadata.actuation.reference_geometries[].{version_date,
    derived_from.id}``) into (theme_id, ref_id, version_date) rows —
    JVM-side from_json + explode, no UDF."""
    schema = (
        "struct<actuation: struct<id: string, type: string,"
        " reference_geometries: array<struct<id: string, type: string,"
        " version_date: string,"
        " derived_from: struct<id: string, type: string, source: string>>>>>"
    )
    parsed = theme_df.select(
        "theme_id", F.from_json(F.col(metadata_col), schema).alias("_md")
    )
    return parsed.select(
        "theme_id",
        F.explode("_md.actuation.reference_geometries").alias("_rg"),
    ).select(
        "theme_id",
        F.col("_rg.derived_from.id").alias("ref_id"),
        F.col("_rg.version_date").alias("version_date"),
    )


def changed_themes(
    theme_lineage: DataFrame, ref_versions: DataFrame
) -> DataFrame:
    """Themes referencing at least one parcel whose current VERSDATUM is
    newer than the recorded version_date.

    theme_lineage: (theme_id, ref_id, version_date) — the per-theme
      `derived_from` records (reference brdr_metadata SOSA lineage,
      fixture plugin/brdrq/test/themelayer_metadata.geojson).
    ref_versions: (ref_id, VERSDATUM).
    """
    cur = ref_versions.select("ref_id", F.col("VERSDATUM").alias("_cur_vd"))
    return (
        theme_lineage.join(cur, "ref_id", "left")
        .where(
            F.col("_cur_vd").isNull()  # parcel disappeared
            | (F.col("_cur_vd") > F.col("version_date"))
        )
        .select("theme_id")
        .distinct()
    )


def update_to_actual(
    spark: SparkSession,
    theme_df: DataFrame,
    theme_lineage: DataFrame,
    ref_df_v2: DataFrame,
    config: AlignConfig | None = None,
    broadcast_ref: bool | None = None,
) -> DataFrame:
    """Re-align only changed themes against the new reference version.

    Returns the align output for the changed subset plus passthrough
    rows (brdr_remark='unchanged_reference') for untouched themes —
    featureCount preserved, as the reference asserts
    (plugin/brdrq/test/test_autoupdateborders.py:44-156).
    """
    changed = changed_themes(theme_lineage, ref_df_v2)
    todo = theme_df.join(changed, "theme_id", "left_semi")
    keep = theme_df.join(changed, "theme_id", "left_anti")

    aligned = align(spark, todo, ref_df_v2, config, broadcast_ref=broadcast_ref)

    cfg = config or AlignConfig()
    passthrough = keep.select(
        "theme_id",
        F.lit(float(max(cfg.relevant_distances))).alias("brdr_relevant_distance"),
        F.col("geom_wkb").alias("result_wkb"),
        F.lit("unchanged_reference").alias("brdr_remark"),
    )
    out_cols = ["theme_id", "brdr_relevant_distance", "result_wkb", "brdr_remark"]
    return aligned.select(*out_cols).unionByName(passthrough.select(*out_cols))
