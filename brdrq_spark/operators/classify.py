"""Correction-layer classification: join evaluated predictions back to
the source features and assign a review state — the reference's
``generate_correction_layer`` CASE chain (plugin/brdrq/brdrq_utils.py:
1210-1365; elif chain :1263-1291; state precedence :1330-1349; enum
brdrq_utils.py:196-209; review gate default 10%
brdrq_algorithm_autocorrectborders.py:424-433, 858).

Pure Spark: a groupBy pre-reduce (one row per source feature even when
the evaluation produced several predictions — the reference detects
duplicate keys in its results loop, brdrq_utils.py:1250-1253) + a join +
when/otherwise projection. The geometry "replace" is a column swap;
``brdrq_original_wkt`` records the pre-alignment geometry
(brdrq_utils.py:195, 1352).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from brdrq_spark.functions.geo import wkb_to_wkt_udf

STATE_NOT_CHANGED = "not_changed"
STATE_AUTO_UPDATED = "auto_updated"
STATE_MANUAL_UPDATED = "manual_updated"
STATE_TO_REVIEW = "to_review"
STATE_TO_UPDATE = "to_update"
STATE_NONE = "none"

# Evaluation labels that skip every review branch and keep the aligned
# geometry outright (reference brdrq_utils.py:1266-1271: the equality
# evaluations "pass" the elif chain, landing on AUTO_UPDATED)
_EQUALITY_EVALS = (
    "equality_by_id",
    "equality_by_full_reference",
    "equality_by_id_and_full_reference",
)


def classify_correction(
    theme_df: DataFrame,
    evaluated: DataFrame,
    review_percentage: float = 10.0,
    min_change_area: float = 0.01,
    geometry_type: str = "polygon",
) -> DataFrame:
    """One row per source feature: chosen geometry + ``brdrq_state``.

    Mirrors brdrq_utils.py:1263-1291 (list building, first match wins)
    then :1330-1349 (state precedence to_update > to_review >
    not_changed > auto_updated):

      evaluation == no_change                  -> not_changed
      evaluation in equality_by_*              -> auto_updated
      empty/missing result geometry            -> to_update
      non-polygon layer + unstable             -> to_update
      non-polygon layer + stable               -> to_review
      unstable (polygon)                       -> to_update
      sym_diff% > review_percentage            -> to_review
      sym_diff area (m^2) < min_change_area    -> not_changed
      otherwise                                -> auto_updated
    Plus: >1 prediction row for a feature      -> to_review
    (reference brdrq_utils.py:1250-1253), and features with no
    prediction at all -> to_update. The aligned geometry replaces the
    original for every state except to_update (the reference applies
    geometry_changes before the state overrides, brdrq_utils.py:1330-1334);
    sym-diff metrics are set to -1 for to_update (ibid.:1345-1347).
    """
    has_stability = "brdr_stability" in evaluated.columns
    sym_abs = (
        F.col("brdr_sym_diff_area")
        if "brdr_sym_diff_area" in evaluated.columns
        else F.lit(None).cast("double")
    )
    ranked = evaluated.select(
        "theme_id",
        F.col("result_wkb").alias("aligned_wkb"),
        "brdr_relevant_distance",
        "brdr_evaluation",
        sym_abs.alias("brdr_sym_diff_area"),
        "brdr_sym_diff_area_index_perc",
        "brdr_sym_diff_area_index",
        "brdr_area",
        F.col("brdr_prediction_score")
        if "brdr_prediction_score" in evaluated.columns
        else F.lit(0.0).alias("brdr_prediction_score"),
        (
            F.col("brdr_stability")
            if has_stability
            else F.lit(None).cast("boolean")
        ).alias("brdr_stability"),
    )
    # the reference's elif chain runs for EVERY prediction row of a key
    # (brdrq_utils.py:1263-1291 accumulates list membership across all
    # duplicate rows — e.g. a non-best row with an empty/unstable result
    # still puts the key in ids_to_align), so evaluate the branch per
    # row BEFORE the argmax filter, then aggregate per theme.
    eval_eq = F.col("brdr_evaluation").isin(*_EQUALITY_EVALS)
    no_change = F.col("brdr_evaluation") == "no_change"
    empty_geom = F.col("aligned_wkb").isNull() | (F.col("brdr_area") <= 0)
    nonpoly = F.lit(geometry_type.lower() != "polygon")
    stab_known = F.lit(has_stability) & F.col("brdr_stability").isNotNull()
    unstable = stab_known & ~F.col("brdr_stability")
    stable = stab_known & F.col("brdr_stability")

    # per-row branch (unstable routes to to_update for both polygon and
    # non-polygon layers, brdrq_utils.py:1272-1284); severity encoding
    # mirrors the reference's state precedence
    # to_update(3) > to_review(2) > not_changed(1) > auto_updated(0)
    to_align = ~no_change & ~eval_eq & (empty_geom | unstable)
    to_review_stab = ~no_change & ~eval_eq & ~empty_geom & nonpoly & stable
    past_stability = ~no_change & ~eval_eq & ~empty_geom & ~to_review_stab & ~unstable
    to_review_sym = past_stability & (
        F.col("brdr_sym_diff_area_index_perc") > review_percentage
    )
    small_change = past_stability & ~to_review_sym & (
        F.col("brdr_sym_diff_area") < F.lit(min_change_area)
    )
    row_severity = (
        F.when(to_align, F.lit(3))
        .when(to_review_stab | to_review_sym, F.lit(2))
        .when(no_change | small_change, F.lit(1))
        .otherwise(F.lit(0))
    )

    # one row per feature: best-scoring prediction carries the geometry
    # (the reference keeps the last row it iterates — ours is the
    # deterministic argmax), n_predictions drives the to_review rule
    wbest = Window.partitionBy("theme_id").orderBy(
        F.desc("brdr_prediction_score"), F.asc("brdr_relevant_distance")
    )
    wtheme = Window.partitionBy("theme_id")
    best = (
        ranked.withColumn("_row_sev", row_severity)
        .withColumn("_rk", F.row_number().over(wbest))
        .withColumn("_n_pred", F.count("*").over(wtheme))
        .withColumn("_max_sev", F.max("_row_sev").over(wtheme))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_row_sev")
    )
    src = theme_df.select(
        "theme_id",
        F.col("geom_wkb").alias("original_wkb"),
    )
    j = src.join(best, "theme_id", "left")

    no_result = F.col("_n_pred").isNull()
    is_multi = F.coalesce(F.col("_n_pred"), F.lit(0)) > 1
    # >1 prediction rows force at least to_review (brdrq_utils.py:1250-1253)
    sev = F.greatest(
        F.coalesce(F.col("_max_sev"), F.lit(0)),
        F.when(is_multi, F.lit(2)).otherwise(F.lit(0)),
    )
    state = (
        F.when(no_result | (sev == 3), STATE_TO_UPDATE)
        .when(sev == 2, STATE_TO_REVIEW)
        .when(sev == 1, STATE_NOT_CHANGED)
        .otherwise(STATE_AUTO_UPDATED)
    )
    out = j.withColumn("brdrq_state", state).withColumn(
        "geom_wkb",
        F.when(
            F.col("brdrq_state") == STATE_TO_UPDATE, F.col("original_wkb")
        ).otherwise(F.coalesce(F.col("aligned_wkb"), F.col("original_wkb"))),
    )
    # to_update rows blank their diff metrics (reference :1345-1347)
    for c in ("brdr_sym_diff_area", "brdr_sym_diff_area_index_perc"):
        out = out.withColumn(
            c,
            F.when(F.col("brdrq_state") == STATE_TO_UPDATE, F.lit(-1.0)).otherwise(
                F.col(c)
            ),
        )
    return (
        out.withColumn("brdrq_original_wkt", wkb_to_wkt_udf(F.col("original_wkb")))
        .drop("original_wkb", "_n_pred", "_max_sev")
    )
