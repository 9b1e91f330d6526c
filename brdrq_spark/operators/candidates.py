"""Spatial candidate generation: the filter half of filter-and-refine.

Re-expresses the reference's three candidate mechanisms (SURVEY.md §2.3
J1-J3: buffered-extent semi-join brdrq_utils.py:1569-1590 +
brdrq_algorithm_autocorrectborders.py:782-800; bbox+distance refine
brdrq_dockwidget_featurealigner.py:1653-1667; within-distance preselect
brdrq_dockwidget_bulkaligner.py:211-227) as ONE relational plan:

    theme cells (dilated cover)  ⋈cell  reference cells
    → distinct (theme_id, ref_id) pairs
    → bbox-distance refine (pure column arithmetic, no UDF)

Catalyst then picks broadcast vs shuffle hash join; we force broadcast
when the reference side is known-small. At cluster scale both sides are
huge: the equi-join on int64 cell ids shuffles hash-partitioned by cell,
and AQE's skew-join splitting handles hot cells (dense urban areas —
reference qa.qmd:19-40); `salt` adds explicit key salting on top when a
single cell key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from brdrq_spark.functions.geo import geo_features_udf
from brdrq_spark.grid import pick_resolution


def with_geo_features(
    df: DataFrame, geom_col: str = "geom_wkb", res: int = 10, dilate: float = 0.0
) -> DataFrame:
    """Attach minx/miny/maxx/maxy/area/perimeter/cells columns."""
    feat = geo_features_udf(res, dilate)
    return df.withColumn("_g", feat(F.col(geom_col))).select("*", "_g.*").drop("_g")


def _fine_cells_udf(fine_res: int, dilate: float, prefix: str):
    """Arrow-batched re-cover of (dilated bbox ∩ coarse cell) at a finer
    resolution — the adaptive-split path for hot cells."""
    import pandas as pd

    from brdrq_spark.grid import cell_bounds, cell_cover_bbox

    def fine(cell, mnx, mny, mxx, mxy):
        out = []
        for c, a, b, cc, d in zip(cell, mnx, mny, mxx, mxy):
            cb = cell_bounds(int(c))
            x0 = max(a - dilate, cb[0])
            y0 = max(b - dilate, cb[1])
            x1 = min(cc + dilate, cb[2])
            y1 = min(d + dilate, cb[3])
            out.append(
                cell_cover_bbox(x0, y0, x1, y1, fine_res).tolist()
                if x0 <= x1 and y0 <= y1
                else []
            )
        return pd.Series(out)

    return F.pandas_udf(fine, "array<long>")


def split_hot_cells(
    t: DataFrame,
    r: DataFrame,
    res: int,
    dilate: float,
    threshold: int,
    split: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Adaptive cell-level splitting of hot cells (north_star: dense
    urban parcels): cells whose REFERENCE density exceeds ``threshold``
    re-index BOTH sides at res+split inside the cell, so one dense cell's
    candidate pairs spread over up to 4^split finer join keys instead of
    one. Cold rows keep their coarse key; fine ids embed the resolution,
    so mixed-resolution keys can never cross-match. Recall is preserved:
    any true pair's bbox intersection lies in some cell both sides cover,
    and within that cell both sides cover the intersection at the SAME
    (fine) resolution.

    Inputs are the exploded cell tables built by candidate_pairs /
    align_candidate_rows with bbox columns prefixed t_/r_.
    """
    counts = (
        r.groupBy("cell").agg(F.count(F.lit(1)).alias("_n")).filter(
            F.col("_n") > threshold
        )
    )
    hot = F.broadcast(counts.select("cell", F.lit(True).alias("_hot")))

    def expand(df: DataFrame, prefix: str, dil: float) -> DataFrame:
        df = df.join(hot, "cell", "left")
        cold = df.filter(F.col("_hot").isNull()).drop("_hot")
        hotr = df.filter(F.col("_hot").isNotNull()).drop("_hot")
        fine = _fine_cells_udf(res + split, dil, prefix)
        hotr = hotr.withColumn(
            "cell",
            F.explode(
                fine(
                    F.col("cell"),
                    F.col(f"{prefix}minx"),
                    F.col(f"{prefix}miny"),
                    F.col(f"{prefix}maxx"),
                    F.col(f"{prefix}maxy"),
                )
            ),
        )
        return cold.unionByName(hotr)

    return expand(t, "t_", dilate), expand(r, "r_", 0.0)


def candidate_pairs(
    theme_df: DataFrame,
    ref_df: DataFrame,
    max_rd: float,
    res: int | None = None,
    broadcast_ref: bool | None = None,
    theme_id: str = "theme_id",
    ref_id: str = "ref_id",
    salt: int = 0,
    hot_cell_threshold: int | None = None,
    hot_split: int = 2,
) -> DataFrame:
    """Distinct (theme_id, ref_id) pairs within 2*max_rd of each other.

    The dilation radius 2*max_rd is the superset of all three reference
    mechanisms (J2/J3 use exactly 2 x max_rd). Returns the pair table
    only — callers join geometries back by key (cheap: co-partitioned on
    the same keys).

    ``salt`` > 0 enables explicit hot-cell salting for the shuffle-join
    path (reference O6: dense urban parcels produce hot cells,
    docs/qa.qmd:19-40): the theme side's join key becomes
    (cell, hash(theme_id) % salt) and the reference side replicates each
    cell row ``salt`` times, so one dense cell spreads over ``salt``
    shuffle partitions. Use when one cell dominates and AQE's skew
    splitting (enabled by default) is not enough; pointless (and
    ignored) with broadcast_ref.
    """
    if res is None:
        res = pick_resolution(max_rd)
    dilate = 2.0 * max_rd * 1.01

    # the decode+cover UDF is the per-row cost here: make sure neither
    # side arrives as a handful of parquet-file partitions and serializes
    # the pass (a single 4k-parcel file would otherwise run on one core)
    par = theme_df.sparkSession.sparkContext.defaultParallelism
    if theme_df.rdd.getNumPartitions() < par:
        theme_df = theme_df.repartition(par)
    if ref_df.rdd.getNumPartitions() < par:
        ref_df = ref_df.repartition(par)

    t = (
        with_geo_features(
            theme_df.select(theme_id, "geom_wkb"), "geom_wkb", res, dilate
        )
        .select(
            theme_id,
            F.col("minx").alias("t_minx"),
            F.col("miny").alias("t_miny"),
            F.col("maxx").alias("t_maxx"),
            F.col("maxy").alias("t_maxy"),
            F.explode("cells").alias("cell"),
        )
    )
    r = (
        with_geo_features(ref_df.select(ref_id, "geom_wkb"), "geom_wkb", res, 0.0)
        .select(
            ref_id,
            F.col("minx").alias("r_minx"),
            F.col("miny").alias("r_miny"),
            F.col("maxx").alias("r_maxx"),
            F.col("maxy").alias("r_maxy"),
            F.explode("cells").alias("cell"),
        )
    )
    if hot_cell_threshold is not None and not broadcast_ref:
        t, r = split_hot_cells(
            t, r, res, dilate, hot_cell_threshold, hot_split
        )
    join_keys = ["cell"]
    if salt > 0 and not broadcast_ref:
        t = t.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(theme_id)), F.lit(salt)).cast("int")
        )
        r = r.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        ).withColumn("_salt", F.col("_salt").cast("int"))
        join_keys = ["cell", "_salt"]
    if broadcast_ref:
        r = F.broadcast(r)

    # bbox distance <= 2*max_rd as pure column arithmetic — the exact
    # geometry test happens inside the alignment kernel itself.
    dx = F.greatest(
        F.col("t_minx") - F.col("r_maxx"), F.col("r_minx") - F.col("t_maxx"), F.lit(0.0)
    )
    dy = F.greatest(
        F.col("t_miny") - F.col("r_maxy"), F.col("r_miny") - F.col("t_maxy"), F.lit(0.0)
    )
    pairs = (
        t.join(r, join_keys)
        .where(F.sqrt(dx * dx + dy * dy) <= F.lit(2.0 * max_rd))
        .select(theme_id, ref_id)
        .distinct()
    )
    return pairs
