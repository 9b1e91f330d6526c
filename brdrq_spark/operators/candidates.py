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
from pyspark.sql import types as T

from brdrq_spark.functions.geo import geo_features_udf
from brdrq_spark.grid import pick_resolution


def plan_partitions(df: DataFrame) -> int:
    """Physical partition count of a DataFrame WITHOUT the classic
    ``df.rdd`` Python-RDD conversion (which wraps the whole plan in a
    Python serializer — avoidable planning cost on wide plans at
    cluster scale). ``queryExecution().toRdd()`` stays JVM-side; falls
    back to ``df.rdd`` on non-classic sessions (e.g. Connect)."""
    try:
        return df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df.rdd.getNumPartitions()


def cells_exploded(
    df: DataFrame,
    id_col: str,
    res: int,
    dilate: float,
    prefix: str,
    wkb_out: str | None = None,
    inline_budget: int | None = None,
    outer: bool = False,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """decode → bbox → cell cover → EXPLODE, all inside ONE Arrow pass.

    Replaces the with_geo_features + F.explode pair: a relational
    explode is a generator whose input expression is evaluated
    separately from the projection, so the pandas UDF ran TWICE per row
    (ArrowEvalPython at two plan steps). Emitting one output row per
    cell from inside mapInPandas evaluates the decode exactly once and
    drops the generator node entirely.

    ``inline_budget``: hybrid WKB shipping — when
    n_cells * len(wkb) exceeds the budget the WKB column ships NULL
    (caller re-joins it by id); None ships the WKB on every row.
    ``outer``: emit one NULL-cell row for empty geometries (explode_outer
    semantics) so every input id survives.

    The per-batch work is two-phase: the WKB decode walks rows (header
    structure is inherently per-geometry; the bbox comes from the same
    snapped ring set the kernels see, so covers stay bit-identical to
    the per-row path), then the cover + row assembly is ONE numpy pass
    over the whole batch — index ranges, repeat-by-count id/bbox
    columns, and a single Morton interleave over every emitted cell,
    instead of a per-row meshgrid + list-extend (measured ~3x on the
    4096-parcel cover batch).
    """
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import bbox as _bbox
    from brdrq_spark.geom import rings_from_wkb
    from brdrq_spark.geom.wkb import polygon_bboxes_batch
    from brdrq_spark.grid import cell_id, cover_ranges

    extra_cols = list(extra_cols or [])
    in_schema = df.schema
    fields = [T.StructField(id_col, in_schema[id_col].dataType)]
    if wkb_out:
        fields.append(T.StructField(wkb_out, T.BinaryType()))
    fields += [
        T.StructField(f"{prefix}_minx", T.DoubleType()),
        T.StructField(f"{prefix}_miny", T.DoubleType()),
        T.StructField(f"{prefix}_maxx", T.DoubleType()),
        T.StructField(f"{prefix}_maxy", T.DoubleType()),
        T.StructField("cell", T.LongType()),
    ]
    for c in extra_cols:
        fields.append(in_schema[c])
    schema = T.StructType(fields)
    names = [f.name for f in fields]

    def gen(batches):
        for pdf in batches:
            # phase 1 — VECTORIZED batch decode (geom.wkb
            # polygon_bboxes_batch: one numpy offset walk over the
            # concatenated buffers, ~25x the per-row header walk). Rows
            # the fast path cannot handle (big-endian, nested multis,
            # corrupt buffers) re-decode through rings_from_wkb so the
            # bbox semantics stay bit-identical: snapped rings,
            # degenerate rings dropped, empty -> outer, corrupt raises.
            wkb_list = pdf["geom_wkb"].tolist()
            bb, nvalid, fb = polygon_bboxes_batch(wkb_list)
            for k in np.nonzero(fb)[0]:
                rings = rings_from_wkb(wkb_list[k])
                if rings:
                    bb[k] = _bbox(rings)
                    nvalid[k] = len(rings)
            has = nvalid > 0
            ids_all = pdf[id_col].to_numpy(dtype=object)
            wkb_all = np.empty(len(pdf), dtype=object)
            wkb_all[:] = wkb_list
            ex_all = {c: pdf[c].to_numpy(dtype=object) for c in extra_cols}

            # outer rows are built with EXPLICIT object dtype: concat of a
            # float64 body column with an all-None column relies on
            # deprecated pandas promotion rules (FutureWarning today, dtype
            # change later); object + None converts to typed Arrow nulls
            # deterministically on every pandas version
            def _outer_pdf():
                miss = ~has
                n_miss = int(miss.sum())
                data = {id_col: pd.Series(list(ids_all[miss]), dtype=object)}
                if wkb_out:
                    data[wkb_out] = pd.Series(list(wkb_all[miss]), dtype=object)
                for k in (f"{prefix}_minx", f"{prefix}_miny",
                          f"{prefix}_maxx", f"{prefix}_maxy", "cell"):
                    data[k] = pd.Series([None] * n_miss, dtype=object)
                for c in extra_cols:
                    data[c] = pd.Series(list(ex_all[c][miss]), dtype=object)
                return pd.DataFrame(data, columns=names)

            if not has.any():
                yield _outer_pdf() if outer else pd.DataFrame(
                    {n: pd.Series([], dtype=object) for n in names},
                    columns=names,
                )
                continue
            ids = ids_all[has]
            wkbs = wkb_all[has]
            ex_vals = {c: ex_all[c][has] for c in extra_cols}

            # phase 2 — one vectorized cover + assembly for the batch
            # (cover arithmetic lives in grid.cover_ranges, shared with
            # the scalar cell_cover_bbox so both join sides agree)
            bb = bb[has]
            ix0, iy0, nx, ny = cover_ranges(
                bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3], res, dilate
            )
            counts = nx * ny
            total = int(counts.sum())
            row_idx = np.repeat(np.arange(len(counts)), counts)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            off = np.arange(total, dtype=np.int64) - starts[row_idx]
            gx = ix0[row_idx] + off % nx[row_idx]
            gy = iy0[row_idx] + off // nx[row_idx]
            cells = cell_id(gx.astype(np.uint64), gy.astype(np.uint64), res)

            out: dict[str, np.ndarray] = {}
            out[id_col] = np.repeat(np.asarray(ids, dtype=object), counts)
            if wkb_out:
                ship = np.asarray(wkbs, dtype=object)
                if inline_budget is not None:
                    lens = np.asarray(
                        [len(w) if w is not None else 0 for w in wkbs],
                        dtype=np.int64,
                    )
                    ship = ship.copy()
                    ship[counts * lens > inline_budget] = None
                out[wkb_out] = np.repeat(ship, counts)
            out[f"{prefix}_minx"] = np.repeat(bb[:, 0], counts)
            out[f"{prefix}_miny"] = np.repeat(bb[:, 1], counts)
            out[f"{prefix}_maxx"] = np.repeat(bb[:, 2], counts)
            out[f"{prefix}_maxy"] = np.repeat(bb[:, 3], counts)
            out["cell"] = cells
            for c in extra_cols:
                out[c] = np.repeat(np.asarray(ex_vals[c], dtype=object), counts)
            body = pd.DataFrame(out, columns=names)
            if outer and not has.all():
                body = pd.concat([body, _outer_pdf()], ignore_index=True)
            yield body

    cols = [id_col, "geom_wkb", *extra_cols]
    return df.select(*cols).mapInPandas(gen, schema=schema)


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


# auto hot-cell rule: a cell is hot when its reference count exceeds
# max(AUTO_HOT_MIN, AUTO_HOT_FACTOR * median cells-per-cell). On a
# uniform tessellation the median is a handful of parcels, the floor
# wins, and nothing splits (no overhead); a 100x-dense urban cell sits
# orders of magnitude above the median and self-splits without any
# operator tuning (reference O6 skew, docs/qa.qmd:19-40).
AUTO_HOT_MIN = 64
AUTO_HOT_FACTOR = 16.0


def split_hot_cells(
    t: DataFrame,
    r: DataFrame,
    res: int,
    dilate: float,
    threshold: int | str,
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

    ``threshold="auto"`` derives the cutoff from the cell-count stats
    themselves (median-anchored, see AUTO_HOT_MIN/AUTO_HOT_FACTOR) —
    entirely inside the DAG: the stats aggregate rides the counts
    shuffle as a one-row broadcast, no driver-side probe action runs.

    Inputs are the exploded cell tables built by candidate_pairs /
    align_candidate_rows with bbox columns prefixed t_/r_.
    """
    cnts = r.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))
    if threshold == "auto":
        stats = cnts.agg(
            F.expr("percentile_approx(_n, 0.5)").cast("double").alias("_med")
        )
        counts = cnts.join(F.broadcast(stats)).filter(
            F.col("_n")
            > F.greatest(
                F.lit(float(AUTO_HOT_MIN)),
                F.lit(AUTO_HOT_FACTOR) * F.col("_med"),
            )
        )
    else:
        counts = cnts.filter(F.col("_n") > threshold)
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
    hot_cell_threshold: int | str | None = None,
    hot_split: int = 2,
) -> DataFrame:
    """Distinct (theme_id, ref_id) pairs within 2*max_rd of each other.
    ``hot_cell_threshold`` accepts an int cutoff or ``"auto"``
    (median-anchored self-tuning — see ``split_hot_cells``).

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
    if plan_partitions(theme_df) < par:
        theme_df = theme_df.repartition(par)
    if plan_partitions(ref_df) < par:
        ref_df = ref_df.repartition(par)

    t = cells_exploded(
        theme_df.select(theme_id, "geom_wkb"), theme_id, res, dilate, "t"
    )
    r = cells_exploded(ref_df.select(ref_id, "geom_wkb"), ref_id, res, 0.0, "r")
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
