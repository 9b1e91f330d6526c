"""Correction-layer classification: join evaluated predictions back to
the source features and assign a review state — the reference's
``generate_correction_layer`` CASE chain (plugin/brdrq/brdrq_utils.py:
1210-1365; thresholds :1286-1291; state writes :1332-1357; enum
brdrq_utils.py:196-209; review gate default 10%
brdrq_algorithm_autocorrectborders.py:424-433, 858).

Pure Spark: a join + when/otherwise projection. The geometry "replace" is
a column swap; ``brdrq_original_wkt`` records the pre-alignment geometry
(brdrq_utils.py:195, 1352).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from brdrq_spark.functions.geo import wkb_to_wkt_udf

STATE_NOT_CHANGED = "not_changed"
STATE_AUTO_UPDATED = "auto_updated"
STATE_MANUAL_UPDATED = "manual_updated"
STATE_TO_REVIEW = "to_review"
STATE_TO_UPDATE = "to_update"
STATE_NONE = "none"


def classify_correction(
    theme_df: DataFrame,
    evaluated: DataFrame,
    review_percentage: float = 10.0,
    min_change_area: float = 0.01,
) -> DataFrame:
    """One row per source feature: chosen geometry + ``brdrq_state``.

    CASE order mirrors brdrq_utils.py:1286-1357:
      multiple predictions        -> to_review (keep original geometry)
      evaluation == no_change     -> not_changed
      empty/missing result        -> to_update
      sym_diff% > review%         -> to_review
      sym_diff area < 0.01 m2     -> not_changed
      otherwise                   -> auto_updated (geometry replaced)
    Features with no prediction at all -> to_update.
    """
    best = evaluated.select(
        "theme_id",
        F.col("result_wkb").alias("aligned_wkb"),
        "brdr_relevant_distance",
        "brdr_evaluation",
        "brdr_prediction_count",
        "brdr_sym_diff_area_index_perc",
        "brdr_sym_diff_area_index",
        "brdr_area",
        "brdr_prediction_score",
    )
    src = theme_df.select(
        "theme_id",
        F.col("geom_wkb").alias("original_wkb"),
    )
    j = src.join(best, "theme_id", "left")

    sym_area_m2 = F.col("brdr_sym_diff_area_index") * F.lit(1.0)  # index vs source
    state = (
        F.when(F.col("aligned_wkb").isNull() & F.col("brdr_evaluation").isNull(), STATE_TO_UPDATE)
        .when(F.col("brdr_prediction_count") > 1, STATE_TO_REVIEW)
        .when(F.col("brdr_evaluation") == "no_change", STATE_NOT_CHANGED)
        .when(F.col("aligned_wkb").isNull() | (F.col("brdr_area") <= 0), STATE_TO_UPDATE)
        .when(F.col("brdr_sym_diff_area_index_perc") > review_percentage, STATE_TO_REVIEW)
        .when(sym_area_m2 < F.lit(min_change_area), STATE_NOT_CHANGED)
        .otherwise(STATE_AUTO_UPDATED)
    )
    out = j.withColumn("brdrq_state", state).withColumn(
        "geom_wkb",
        F.when(F.col("brdrq_state") == STATE_AUTO_UPDATED, F.col("aligned_wkb")).otherwise(
            F.col("original_wkb")
        ),
    )
    return out.withColumn("brdrq_original_wkt", wkb_to_wkt_udf(F.col("original_wkb"))).drop(
        "original_wkb"
    )
