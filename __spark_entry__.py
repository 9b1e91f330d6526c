"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (image+caption table →
vectorized footprint extraction → cell-indexed candidate join →
distributed border alignment). ``queries()`` catalogs one entry per
implemented operator from SURVEY.md §2 (+ the training-pipeline ops);
``oracle_sql()`` holds the DuckDB mirrors for the SQL-expressible ones —
geometry-native operators carry no oracle and get the driver's
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def _doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# flagship entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize the input_hint image+caption table (captions
    drawn from the sf0.001 documents table), extract footprints, align
    them to the synthetic reference parcels at rd=2."""
    import pandas as pd

    from brdrq_spark.operators.align import AlignConfig, align
    from brdrq_spark.operators.footprints import extract_footprints
    from brdrq_spark.sources.synthetic import images_table, reference_parcels

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(32)
        .collect()
    )
    pdf = images_table(32, seed=42)
    pdf["caption"] = [r.text[:64] for r in docs]
    images = spark.createDataFrame(pdf)
    ref = spark.createDataFrame(reference_parcels(64, 64, seed=42))

    fps = extract_footprints(images)
    theme = fps.select("theme_id", "geom_wkb")
    aligned = align(
        spark, theme, ref, AlignConfig(relevant_distances=[2.0]), broadcast_ref=True
    )
    return aligned.join(
        fps.select("theme_id", "image_id", "caption", "pixel_sha"), "theme_id"
    ).select(
        "theme_id",
        "image_id",
        "caption",
        "pixel_sha",
        F.round("brdr_area", 3).alias("brdr_area"),
        F.round("brdr_sym_diff_area_index_perc", 3).alias("sym_diff_perc"),
        "brdr_nr_references",
        F.size("cell_ids").alias("n_cells"),
    )


# --------------------------------------------------------------------------
# SQL-expressible operator queries (oracle-checked)
# --------------------------------------------------------------------------

def q_tpch_q1(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)                        AS sum_qty,
             round(sum(l_extendedprice), 2)                   AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4)                        AS avg_qty,
             count(*)                                         AS count_order
      FROM lineitem WHERE l_shipdate <= timestamp'1998-09-02'
      GROUP BY l_returnflag, l_linestatus
    """)


def q_p6_nonzero_filter(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT l_orderkey, l_linenumber, l_discount
      FROM lineitem WHERE l_discount != 0
    """)


def q_p9_text_search(spark, sf_dir):
    """P9 prioritized-field attribute search (reference keyword-ranked
    field subset capped at 15, brdrq_dockwidget_featurealigner.py:
    166-187, 479-529): over the 17-column lineitem x orders join the 8
    keyword-matched fields rank first, 7 remaining fill the cap, and
    o_orderdate / o_orderpriority fall OFF the end — a needle occurring
    only there does not match. Needle '-05-2' hits l_shipdate (selected)
    but its o_orderdate occurrences are invisible."""
    from brdrq_spark.operators.textstats import prioritized_text_search

    _views(spark, sf_dir)
    joined = spark.table("lineitem").join(
        spark.table("orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return prioritized_text_search(joined, "-05-2").select(
        "l_orderkey", "l_linenumber"
    )


def q_p10_selection_semi_join(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT o_orderkey FROM orders
      WHERE EXISTS (SELECT 1 FROM customer
                    WHERE c_custkey = o_custkey AND c_acctbal > 5000)
    """)


def q_a13_changed_anti_join(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """)


def q_g7_state_counts(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT CASE WHEN o_orderstatus = 'F' AND o_totalprice < 1000 THEN 'not_changed'
                  WHEN o_totalprice > 50000                        THEN 'to_review'
                  WHEN o_orderpriority LIKE '1%'                   THEN 'auto_updated'
                  ELSE 'none' END AS brdrq_state,
             count(*) AS n
      FROM orders GROUP BY 1
    """)


_W1_SQL = """
  WITH flagged AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ), runs AS (
    SELECT user_id,
           sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS run_id
    FROM flagged
  )
  SELECT user_id, count(DISTINCT run_id) AS n_runs,
         max(run_len) AS longest_run
  FROM (SELECT user_id, run_id, count(*) AS run_len
        FROM runs GROUP BY user_id, run_id)
  GROUP BY user_id
"""


def q_w1_stability_runs(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql(_W1_SQL)


def q_w2_best_argmax(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT o_custkey, o_orderkey
      FROM (SELECT o_custkey, o_orderkey,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn = 1
    """)


def q_w3_count_over(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT o_orderkey,
             count(*) OVER (PARTITION BY o_custkey) AS n_orders_of_cust
      FROM orders
    """)


def q_t3_topk_per_group(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT p_brand, p_partkey, p_retailprice
      FROM (SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rn
            FROM part)
      WHERE rn <= 3
    """)


def q_g1_revenue_per_nation(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
    """)


def q_g5_minmax_events(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT event_type, round(min(value), 4) AS min_v, round(max(value), 4) AS max_v,
             round(avg(value), 4) AS avg_v, count(*) AS n
      FROM events GROUP BY event_type
    """)


def q_pivot_status_matrix(spark, sf_dir):
    """Pivot/unpivot shape: returnflag x linestatus quantity matrix
    (DataFrame .pivot; mirrored as conditional aggregation in DuckDB)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
        .select(
            "l_returnflag",
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_o"),
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_f"),
        )
    )


def q_dedup_exact(spark, sf_dir):
    from brdrq_spark.operators.dedup import exact_dedup

    return exact_dedup(_doc(spark, sf_dir))


def q_text_quality(spark, sf_dir):
    from brdrq_spark.operators.textstats import quality_scores

    return quality_scores(_doc(spark, sf_dir))


def q_langid(spark, sf_dir):
    from brdrq_spark.operators.textstats import langid_heuristic

    return langid_heuristic(_doc(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    from brdrq_spark.operators.textstats import token_counts

    return token_counts(_doc(spark, sf_dir))


def q_sessionize(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT user_id, cast(sum(flag) + 1 AS bigint) AS n_sessions
      FROM (SELECT user_id,
                   CASE WHEN unix_micros(cast(ts AS timestamp)) -
                             lag(unix_micros(cast(ts AS timestamp))) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id) > 600000000
                        THEN 1 ELSE 0 END AS flag
            FROM events)
      GROUP BY user_id
    """)


def q_u3_set_except(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT DISTINCT source FROM documents WHERE lang = 'en'
      EXCEPT
      SELECT DISTINCT source FROM documents WHERE lang = 'de'
    """)


def q_similarity_cosine(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    v = F.col("embedding").cast("array<double>")

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)

    def norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))

    return (
        emb.where((F.col("vec_id") != 0) & (F.col("vec_id") < 50))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot(v, F.col("qv")) / (norm(v) * norm(F.col("qv"))), 3).alias("cosine"),
        )
    )


def q_streaming_windowed_counts(spark, sf_dir):
    """Watermarked-window aggregation shape (SURVEY.md §2.10) on the
    static events table; win_start exported as epoch seconds so the
    DuckDB time_bucket mirror compares exactly."""
    from brdrq_spark.streaming.events import windowed_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(ev, window="1 hour")
    return out.select(
        F.unix_timestamp("win_start").alias("win_start_epoch"),
        "event_type",
        "n",
        "sum_value",
    )


def q_f2_string_funcs(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT c_custkey,
             upper(substr(c_name, 1, 8))            AS name_prefix,
             concat(c_mktsegment, '#', c_custkey)   AS seg_key,
             cast(length(replace(c_name, ' ', '')) AS bigint) AS name_len_nospace
      FROM customer
    """)


def q_f3_date_buckets(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT date_format(o_orderdate, 'yyyy-MM') AS order_month,
             count(*) AS n,
             round(sum(o_totalprice), 2) AS month_total
      FROM orders GROUP BY 1
    """)


def q_f4_math_round(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT l_orderkey, l_linenumber,
             cast(floor(l_extendedprice * 100) AS bigint) AS price_cents,
             round(l_discount * 100, 1)                   AS discount_pct,
             cast(abs(l_quantity - 25) AS double)         AS qty_dev
      FROM lineitem WHERE l_linenumber = 1
    """)


# --------------------------------------------------------------------------
# geometry-native operators (no SQL oracle → driver rows-only check)
# --------------------------------------------------------------------------

def _synthetic_align_inputs(spark, n_theme=24, grid=24, seed=7):
    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    ref = spark.createDataFrame(reference_parcels(grid, grid, seed=seed))
    th = spark.createDataFrame(thematic_polygons(n_theme, grid, grid, seed=seed, jitter=1.0))
    return th, ref


def q_align_flagship(spark, sf_dir):
    from brdrq_spark.operators.align import AlignConfig, align

    th, ref = _synthetic_align_inputs(spark)
    out = align(spark, th, ref, AlignConfig(relevant_distances=[2.0]), broadcast_ref=True)
    return out.select(
        "theme_id",
        "brdr_relevant_distance",
        F.round("brdr_area", 2).alias("brdr_area"),
        F.round("brdr_sym_diff_area_index_perc", 2).alias("sym_diff_perc"),
        "brdr_full_actual",
        "brdr_nr_references",
        F.size("cell_ids").alias("n_cells"),
    )


def q_footprint_extraction(spark, sf_dir):
    """M6 raster→vector ORACLE-CHECKED: planted rectangle masks (rw x rh
    = (4+i%7) x (3+i%5) pixels in a 40 px image at 40 m extent → scale
    exactly 1) make fp_area = rw*rh m² relationally derivable; the
    decode→threshold→trace→place pipeline is the real one (PNG + raw
    codecs, lossy quantization branch included)."""
    from brdrq_spark.operators.footprints import extract_footprints
    from brdrq_spark.sources.synthetic import rect_images_table

    images = spark.createDataFrame(rect_images_table(24))
    return extract_footprints(images).select(
        "theme_id", "image_id", F.round("fp_area", 2).alias("fp_area"), "caption"
    )


def q_evaluate_prediction_sweep(spark, sf_dir):
    """A5 ALL sweep + A9 BEST argmax in one result (strategy column
    tags the rows) — merged so the driver's 50-query report window fits
    every operator. ONE kernel pass: the BEST rows are the same rank-1
    window evaluate() itself applies under STRATEGY_BEST (score desc,
    rd asc), so re-running the grid sweep would only repeat the align
    kernel for identical output (the STRATEGY_BEST code path stays
    pytest-driven in test_pipeline_ops)."""
    from pyspark.sql import Window

    from brdrq_spark.operators.evaluate import evaluate

    th, ref = _synthetic_align_inputs(spark, n_theme=6, grid=10, seed=5)
    sweep = evaluate(spark, th, ref, max_rd=2.0, step=0.5, broadcast_ref=True)
    cols = [
        "theme_id",
        "brdr_relevant_distance",
        "brdr_stability",
        "brdr_prediction_score",
        "brdr_prediction_count",
        "brdr_evaluation",
    ]
    wbest = Window.partitionBy("theme_id").orderBy(
        F.desc("brdr_prediction_score"), F.asc("brdr_relevant_distance")
    )
    best = (
        sweep.withColumn("_rk", F.row_number().over(wbest))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    return (
        sweep.select(F.lit("ALL").alias("strategy"), *cols)
        .unionByName(best.select(F.lit("BEST").alias("strategy"), *cols))
    )


def q_classify_correction(spark, sf_dir):
    from brdrq_spark.operators.classify import classify_correction
    from brdrq_spark.operators.evaluate import evaluate

    th, ref = _synthetic_align_inputs(spark, n_theme=6, grid=10, seed=5)
    ev = evaluate(spark, th, ref, max_rd=2.0, step=0.5, broadcast_ref=True)
    return classify_correction(th, ev).select("theme_id", "brdrq_state")


def q_g4_correction_chain(spark, sf_dir):
    """G4 full CASE chain, oracle-checked: drives the REAL
    classify_correction operator (equality evals, stability routing,
    multi-prediction to_review, sym thresholds, -1 blanking — reference
    brdrq_utils.py:1263-1291, 1330-1349) with a deterministic evaluated
    table derived from `orders`; the DuckDB oracle re-derives the same
    states relationally."""
    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.classify import classify_correction
    import numpy as np

    _views(spark, sf_dir)
    sq = rings_to_wkb(
        [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]
    )
    o = spark.table("orders")
    k = F.col("o_orderkey")
    price = F.floor("o_totalprice").cast("bigint")
    ev = o.filter(k % 23 != 0).select(
        k.alias("theme_id"),
        F.lit(1.0).alias("brdr_relevant_distance"),
        F.when(k % 19 == 0, F.lit(None).cast("binary"))
        .otherwise(F.lit(bytearray(sq)))
        .alias("result_wkb"),
        F.when(k % 13 == 0, "no_change")
        .when(k % 13 == 1, "equality_by_id")
        .otherwise("prediction_unique")
        .alias("brdr_evaluation"),
        F.when(k % 17 == 0, 0.0).otherwise(100.0).alias("brdr_area"),
        (k % 11 != 0).alias("brdr_stability"),
        (k % 5).cast("double").alias("brdr_prediction_score"),
        ((price % 100) / 2.0).alias("brdr_sym_diff_area_index_perc"),
        ((price % 100) / 200.0).alias("brdr_sym_diff_area_index"),
        ((price % 7) / 100.0).alias("brdr_sym_diff_area"),
    )
    dup = ev.filter(F.col("theme_id") % 10 == 0).withColumn(
        "brdr_prediction_score", F.col("brdr_prediction_score") - 1.0
    ).withColumn("brdr_relevant_distance", F.lit(2.0))
    theme = o.select(k.alias("theme_id"), F.lit(bytearray(sq)).alias("geom_wkb"))
    out = classify_correction(theme, ev.unionByName(dup))
    return out.select(
        "theme_id",
        "brdrq_state",
        F.round("brdr_sym_diff_area", 2).alias("sym_area"),
        F.round("brdr_sym_diff_area_index_perc", 2).alias("sym_perc"),
    )


def q_cell_cover(spark, sf_dir):
    """Morton grid oracle: cell_of_points (brdrq_spark/grid.py — the
    H3/S2-analogue tile assignment every spatial join keys on) vs the
    same bit-interleave spelled out in DuckDB integer arithmetic.
    Coordinates span negative/positive to exercise the bias."""
    import pandas as pd

    from brdrq_spark.grid import cell_of_points

    _views(spark, sf_dir)

    cell_udf = F.pandas_udf(
        lambda x, y: pd.Series(cell_of_points(x.to_numpy(), y.to_numpy(), 10)),
        "long",
    )

    o = spark.table("orders").select(
        "o_orderkey",
        ((F.col("o_orderkey") % 1000).cast("double") * 3.7 - 1850.0).alias("x"),
        ((F.col("o_custkey") % 997).cast("double") * 2.3 - 1150.0).alias("y"),
    )
    return o.select(
        "o_orderkey",
        F.round("x", 4).alias("x"),
        F.round("y", 4).alias("y"),
        cell_udf("x", "y").alias("cell_id"),
    )


def q_align_rect_closed_form(spark, sf_dir):
    """Align metrics proven correct against closed-form values: themes
    are 10x10 parcels shifted by dx = 0.1*(i%5) <= 0.4 m; at rd=2 the
    uncovered strip erodes away so the FULL branch snaps each theme to
    its parcel exactly (align.py semantics block) — area 100, perimeter
    40, sym-diff 2*dx*10, one reference candidate."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig, align

    def sq(x0):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]])]
        )

    n = 40
    ref = spark.createDataFrame(
        pd.DataFrame(
            [{"ref_id": f"r{i}", "geom_wkb": sq(20.0 * i)} for i in range(n)]
        )
    )
    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": f"t{i}", "geom_wkb": sq(20.0 * i + 0.1 * (i % 5))}
                for i in range(n)
            ]
        )
    )
    cfg = AlignConfig(relevant_distances=[2.0], od_strategy="EXCLUDE")
    out = align(spark, th, ref, cfg, broadcast_ref=True)
    return out.select(
        "theme_id",
        F.round("brdr_area", 2).alias("brdr_area"),
        F.round("brdr_perimeter", 2).alias("brdr_perimeter"),
        F.round("brdr_sym_diff_area", 2).alias("sym_area"),
        "brdr_nr_references",
    )


def q_sosa_lineage_roundtrip(spark, sf_dir):
    """SOSA lineage round-trip, oracle-checked: align emits brdr_metadata
    (reference writes it per output feature,
    brdrq_algorithm_autocorrectborders.py:574-577; structure per fixture
    plugin/brdrq/test/themelayer_metadata.geojson), then the temporal
    operator parses the engine's OWN output back into lineage rows. The
    closed-form rectangle fixture makes the expected rows trivial:
    theme t_i derives exactly from parcel r_i at the ref version date."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig, align
    from brdrq_spark.operators.temporal import lineage_from_metadata

    def sq(x0):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]])]
        )

    n = 40
    ref = spark.createDataFrame(
        pd.DataFrame(
            [
                {"ref_id": f"r{i}", "geom_wkb": sq(20.0 * i), "VERSDATUM": "2024-01-01"}
                for i in range(n)
            ]
        )
    )
    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": f"t{i}", "geom_wkb": sq(20.0 * i + 0.1 * (i % 5))}
                for i in range(n)
            ]
        )
    )
    cfg = AlignConfig(
        relevant_distances=[2.0], od_strategy="EXCLUDE", emit_metadata=True
    )
    out = align(spark, th, ref, cfg, broadcast_ref=True)
    return lineage_from_metadata(out)


def q_diff_metrics_series(spark, sf_dir):
    """G2: per-(theme, rd) difference-metric series (the FeatureAligner
    plot data, brdrq_dockwidget_featurealigner.py:1690-1692) over the
    closed-form rectangle fixture: every grid distance snaps to the full
    parcel, so the series is flat — area 100, sym-diff 2*dx*10, zero
    step delta (NULL at the first grid point)."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig, align
    from brdrq_spark.operators.evaluate import diff_metrics_series

    def sq(x0):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]])]
        )

    n = 40
    ref = spark.createDataFrame(
        pd.DataFrame([{"ref_id": f"r{i}", "geom_wkb": sq(20.0 * i)} for i in range(n)])
    )
    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": f"t{i}", "geom_wkb": sq(20.0 * i + 0.1 * (i % 5))}
                for i in range(n)
            ]
        )
    )
    cfg = AlignConfig(relevant_distances=[0.5, 1.0, 2.0], od_strategy="EXCLUDE")
    out = diff_metrics_series(align(spark, th, ref, cfg, broadcast_ref=True))
    return out.select(
        "theme_id",
        "brdr_relevant_distance",
        F.round("brdr_area", 2).alias("brdr_area"),
        F.round("brdr_sym_diff_area", 2).alias("sym_area"),
        F.round("brdr_sym_diff_area_index_perc", 2).alias("sym_perc"),
        F.round("brdr_diff_area_index", 2).alias("diff_area_idx"),
        F.round("delta_sym_diff_area", 2).alias("delta_sym"),
    )


def q_evaluate_closed_form(spark, sf_dir):
    """A5/A7/W1 proven correct end-to-end: the prediction sweep over the
    closed-form rectangle fixture. Grid [0, .5, 1, 1.5, 2]: at rd=0 the
    partial branch keeps the bare overlap (sym = 10*dx); at rd >= 0.5
    the uncovered strip erodes away and the FULL branch snaps to the
    parcel (sym = 20*dx) — so shifted themes have exactly one stable run
    of length 4 (prediction at rd=0.5, score 4, prediction_unique).

    Unshifted themes (i%5==0) are planted equality cases (reference enum
    docs/autocorrectborders.md:209): i%20==0 carries a ref key and equals
    its single parcel -> equality_by_id_and_full_reference; i%20==10
    carries a key but the candidate set also holds two overlapping
    half-parcels, so brdr_ref_full_area = 200 != 100 breaks the
    full-reference equality -> equality_by_id alone; i%10==5 has no key
    -> equality_by_full_reference."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig
    from brdrq_spark.operators.evaluate import evaluate

    def rect(x0, w):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + w, 0.0], [x0 + w, 10.0], [x0, 10.0]])]
        )

    def sq(x0):
        return rect(x0, 10.0)

    n = 40
    refs = [{"ref_id": f"r{i}", "geom_wkb": sq(20.0 * i)} for i in range(n)]
    for i in range(n):
        if i % 20 == 10:
            # overlapping half-parcels: adopted whole alongside r{i}, so
            # the full-reference area total (200) exceeds the result (100)
            refs.append({"ref_id": f"r{i}a", "geom_wkb": rect(20.0 * i, 5.0)})
            refs.append({"ref_id": f"r{i}b", "geom_wkb": rect(20.0 * i + 5.0, 5.0)})
    ref = spark.createDataFrame(pd.DataFrame(refs))
    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "theme_id": f"t{i}",
                    "geom_wkb": sq(20.0 * i + 0.1 * (i % 5)),
                    "brdr_ref_key": f"r{i}" if i % 10 == 0 else None,
                }
                for i in range(n)
            ]
        )
    )
    cfg = AlignConfig(relevant_distances=[2.0], od_strategy="EXCLUDE")
    out = evaluate(
        spark, th, ref, max_rd=2.0, step=0.5, config=cfg, broadcast_ref=True,
        ref_key_col="brdr_ref_key",
    )
    return out.select(
        "theme_id",
        "brdr_relevant_distance",
        "brdr_prediction_score",
        F.col("brdr_prediction_count").cast("bigint").alias("brdr_prediction_count"),
        "brdr_evaluation",
        F.round("brdr_sym_diff_area", 2).alias("sym_area"),
    )


def q_classify_closed_form(spark, sf_dir):
    """G4 on real geometry, oracle-checked: align → evaluate → classify
    over the closed-form fixture. Unshifted themes equal their full
    parcel → equality_by_full_reference → auto_updated (equality evals
    skip every review branch, brdrq_utils.py:1266-1271); shifted ones
    have sym% = 2*(i%5) <= 8 < review gate 10 and sym area >= 2 m2 >
    0.01 → auto_updated."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig
    from brdrq_spark.operators.classify import classify_correction
    from brdrq_spark.operators.evaluate import evaluate

    def sq(x0):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]])]
        )

    n = 40
    ref = spark.createDataFrame(
        pd.DataFrame([{"ref_id": f"r{i}", "geom_wkb": sq(20.0 * i)} for i in range(n)])
    )
    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": f"t{i}", "geom_wkb": sq(20.0 * i + 0.1 * (i % 5))}
                for i in range(n)
            ]
        )
    )
    cfg = AlignConfig(relevant_distances=[2.0], od_strategy="EXCLUDE")
    ev = evaluate(spark, th, ref, max_rd=2.0, step=0.5, config=cfg, broadcast_ref=True)
    out = classify_correction(th, ev)
    return out.select(
        "theme_id",
        "brdrq_state",
        F.round("brdr_sym_diff_area", 2).alias("sym_area"),
    )


def q_snaplines_closed_form(spark, sf_dir):
    """A10 proven correct: vertical 8 m polylines offset dx from a parcel
    edge densify to 5 vertices (max_seg 2) and all snap onto the edge —
    n_snapped = 5, max_move = dx exactly."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.geom.wkb import lines_to_wkb
    from brdrq_spark.operators.snaplines import SNAP_NO_PREFERENCE, align_lines

    n = 40
    refs, themes = [], []
    for i in range(n):
        x0 = 20.0 * i
        dx = 0.2 + 0.1 * (i % 5)
        refs.append(
            {
                "ref_id": f"r{i}",
                "geom_wkb": rings_to_wkb(
                    [
                        np.array(
                            [[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]]
                        )
                    ]
                ),
            }
        )
        line = np.array([[x0 + 10.0 + dx, 1.0], [x0 + 10.0 + dx, 9.0]])
        themes.append({"theme_id": f"t{i}", "geom_wkb": lines_to_wkb([line])})
    th = spark.createDataFrame(pd.DataFrame(themes))
    ref = spark.createDataFrame(pd.DataFrame(refs))
    out = align_lines(
        spark, th, ref, relevant_distance=2.0,
        snap_strategy=SNAP_NO_PREFERENCE, broadcast_ref=True,
    )
    return out.select(
        "theme_id",
        F.col("n_vertices").cast("bigint").alias("n_vertices"),
        F.col("n_snapped").cast("bigint").alias("n_snapped"),
        F.round("max_move", 3).alias("max_move"),
        "brdr_remark",
    )


def q_temporal_closed_form(spark, sf_dir):
    """A13 proven correct: bump VERSDATUM on parcels i%7==0; exactly
    those themes re-align (empty remark) and every other row passes
    through as unchanged_reference."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig
    from brdrq_spark.operators.temporal import update_to_actual

    def sq(x0):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]])]
        )

    n = 40
    ref_v2 = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "ref_id": f"r{i}",
                    "geom_wkb": sq(20.0 * i),
                    "VERSDATUM": "2025-01-01" if i % 7 == 0 else "2023-01-01",
                }
                for i in range(n)
            ]
        )
    )
    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": f"t{i}", "geom_wkb": sq(20.0 * i + 0.1 * (i % 5))}
                for i in range(n)
            ]
        )
    )
    lineage = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": f"t{i}", "ref_id": f"r{i}", "version_date": "2023-06-01"}
                for i in range(n)
            ]
        )
    )
    out = update_to_actual(
        spark, th, lineage, ref_v2,
        AlignConfig(relevant_distances=[2.0], od_strategy="EXCLUDE"),
        broadcast_ref=True,
    )
    return out.select("theme_id", "brdr_relevant_distance", "brdr_remark")


def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH ORACLE-CHECKED by planted byte-identical pairs: the
    text-distinct docs under id 40 are each duplicated at id+10000;
    identical texts share every band bucket, so the candidate set is
    exactly {(i, i+10000)} — verified empirically to admit no natural
    cross-pair on this corpus (the full-table variant stays exercised by
    dedup benchmarks)."""
    from brdrq_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _doc(spark, sf_dir)
    base = (
        docs.where("doc_id < 40")
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text")
    )
    corpus = base.unionByName(
        base.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )
    sigs = minhash_signatures(shingles(corpus, k=3), num_perm=16)
    return lsh_candidate_pairs(sigs, bands=8)


def q_simhash(spark, sf_dir):
    """SimHash ORACLE-CHECKED by planted invariants: byte-identical
    copies (id+10000) hash identically (dup_sig_equal always true) and
    each text-distinct base doc differs from its id-order neighbor
    (neighbor_differs always true — 64-bit signatures of distinct docs;
    verified stable on this deterministic corpus)."""
    from pyspark.sql import Window

    from brdrq_spark.operators.dedup import simhash

    docs = _doc(spark, sf_dir)
    base = (
        docs.where("doc_id < 40")
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text")
    )
    corpus = base.unionByName(
        base.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )
    sigs = simhash(corpus)
    orig = sigs.where("doc_id < 10000")
    copy = sigs.where("doc_id >= 10000").select(
        (F.col("doc_id") - 10000).alias("doc_id"), F.col("simhash").alias("sig_copy")
    )
    w = Window.orderBy("doc_id")
    return (
        orig.join(copy, "doc_id")
        .withColumn(
            "neighbor_differs",
            F.coalesce(F.col("simhash") != F.lag("simhash").over(w), F.lit(True)),
        )
        .select(
            "doc_id",
            (F.col("simhash") == F.col("sig_copy")).alias("dup_sig_equal"),
            "neighbor_differs",
        )
    )


def q_knn_bucketed(spark, sf_dir):
    """ANN kNN join proven by planted duplicates: queries are exact
    copies of corpus vectors 0..19 (q_id = vec_id + 1000000). Identical
    vectors share a random-hyperplane signature, so each query's rank-1
    neighbor is its source vector at cosine 1.0 — recall 1.0 by
    construction, relationally derivable in the oracle."""
    from brdrq_spark.operators.similarity import knn_join_bucketed

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    out = knn_join_bucketed(emb, queries, k=5)
    return out.where(F.col("rank") == 1).select(
        "q_id", "c_id", "cosine", F.col("rank").cast("bigint").alias("rank")
    )


def q_knn_boundary(spark, sf_dir):
    """J6: kNN nearest-boundary-segment refinement."""
    from brdrq_spark.operators.knn import knn_boundary_segments

    th, ref = _synthetic_align_inputs(spark, n_theme=4, grid=8, seed=3)
    out = knn_boundary_segments(spark, th, ref, k=2, search_radius=8.0)
    return out.select(
        "theme_id", "vertex_idx", "ref_id", "seg_idx",
        F.round("dist", 4).alias("dist"), "rank",
    )


def q_knn_closed_form(spark, sf_dir):
    """J6 kNN proven correct: themes are squares offset (dx, 0.15) from
    their parcels; every vertex's 2 nearest boundary segments and exact
    clamped point-segment distances are re-derivable relationally — the
    DuckDB oracle enumerates the same vertices/segments and applies the
    same clamp formula, including the corner TIE at vertex 2 broken by
    seg_idx."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.knn import knn_boundary_segments

    refs, themes = [], []
    for i in range(40):
        x0 = 20.0 * i
        dx = 0.2 + 0.1 * (i % 5)
        dy = 0.15
        refs.append(
            {
                "ref_id": f"r{i}",
                "geom_wkb": rings_to_wkb(
                    [
                        np.array(
                            [[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]]
                        )
                    ]
                ),
            }
        )
        themes.append(
            {
                "theme_id": f"t{i}",
                "geom_wkb": rings_to_wkb(
                    [
                        np.array(
                            [
                                [x0 + dx, dy],
                                [x0 + 10.0 + dx, dy],
                                [x0 + 10.0 + dx, 10.0 + dy],
                                [x0 + dx, 10.0 + dy],
                            ]
                        )
                    ]
                ),
            }
        )
    th = spark.createDataFrame(pd.DataFrame(themes))
    ref = spark.createDataFrame(pd.DataFrame(refs))
    out = knn_boundary_segments(spark, th, ref, k=2, search_radius=8.0)
    return out.select(
        "theme_id",
        F.col("vertex_idx").cast("bigint").alias("vertex_idx"),
        "ref_id",
        F.col("seg_idx").cast("bigint").alias("seg_idx"),
        F.round("dist", 4).alias("dist"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def q_streaming_sessionize(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user session windows with event-time gap timeout. Genuinely
    non-SQL-expressible (keyed mutable state + timeouts) — the batch
    mirror is the oracle-checked `sessionize_events`."""
    import shutil
    import tempfile

    import pandas as pd

    from brdrq_spark.streaming.events import run_stream_to_memory
    from brdrq_spark.streaming.sessions import sessionize_stream

    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    for u in range(1, 9):
        offs, t = [], 0
        for j in range(6):
            t += 100 if (u + j) % 3 else 700  # >600s gap starts a session
            offs.append(t)
        rows.extend({"ts": base + pd.Timedelta(seconds=o), "user_id": u} for o in offs)
    pdf = pd.DataFrame(rows).sort_values("ts").reset_index(drop=True)
    d = tempfile.mkdtemp(prefix="brdrq_sess_")
    try:
        third = len(pdf) // 3 + 1
        for i in range(3):
            part = pdf.iloc[i * third : (i + 1) * third]
            if len(part):
                part.to_parquet(
                    f"{d}/part{i}.parquet", index=False, coerce_timestamps="us"
                )
        pd.DataFrame([{"ts": base + pd.Timedelta(days=2), "user_id": 999}]).to_parquet(
            f"{d}/part9.parquet", index=False, coerce_timestamps="us"
        )
        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
        )
        out = sessionize_stream(stream, gap_seconds=600, watermark="0 seconds")
        q = run_stream_to_memory(out, "q_sessions_out")
        res = (
            spark.table("q_sessions_out")
            .filter(F.col("user_id") != 999)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_sessions"),
                F.sum("n_events").alias("n_events"),
            )
            .orderBy("user_id")
        )
        rows_out = res.collect()
        q.stop()
        return spark.createDataFrame(rows_out, res.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_align_topology(spark, sf_dir):
    """A2 TopologyProcessor ORACLE-CHECKED on a two-adjacent-themes
    closed form: pair i is two 10x10 themes shifted dx = 0.1 + 0.01*(i%5)
    east over parcels [30i,30i+10] / [30i+10,30i+20] x [0,10]. Every
    edge snaps back onto the parcel grid (corners PREFER_VERTICES,
    in-fill to the nearest boundary), and the COMMON border — one
    distinct edge, snapped once — lands on x = 30i+10 from both sides:
    each result equals its parcel exactly (area 100, sym-diff 0), and
    the pair shares 1 edge."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.functions.geo import sym_diff_area_udf
    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.topology import align_topology

    def sq(x0, w=10.0):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + w, 0.0], [x0 + w, 10.0], [x0, 10.0]])]
        )

    n_pairs = 20
    refs, themes = [], []
    for i in range(n_pairs):
        x0 = 30.0 * i
        dx = 0.1 + 0.01 * (i % 5)
        refs.append({"ref_id": f"ra{i}", "geom_wkb": sq(x0)})
        refs.append({"ref_id": f"rb{i}", "geom_wkb": sq(x0 + 10.0)})
        themes.append({"theme_id": f"a{i:02d}", "geom_wkb": sq(x0 + dx)})
        themes.append({"theme_id": f"b{i:02d}", "geom_wkb": sq(x0 + 10.0 + dx)})
    th = spark.createDataFrame(pd.DataFrame(themes))
    ref = spark.createDataFrame(pd.DataFrame(refs))
    out = align_topology(spark, th, ref, relevant_distance=1.0, broadcast_ref=True)
    parcels = spark.createDataFrame(
        pd.DataFrame(
            [
                {"theme_id": f"{s}{i:02d}", "parcel_wkb": sq(30.0 * i + off)}
                for i in range(n_pairs)
                for s, off in (("a", 0.0), ("b", 10.0))
            ]
        )
    )
    return (
        out.join(parcels, "theme_id")
        .select(
            "theme_id",
            F.round("brdr_area", 2).alias("brdr_area"),
            F.round(
                sym_diff_area_udf()(F.col("result_wkb"), F.col("parcel_wkb")), 6
            ).alias("sym_vs_parcel"),
            "n_edges",
            "n_shared_edges",
        )
    )


def q_resume_lineage(spark, sf_dir):
    """M7 ORACLE-CHECKED: Iceberg-style commit log on the FLAGSHIP
    operator — run the checkpointed align twice; the second pass must
    skip every committed shard. Closed-form fixture (10x10 parcels,
    themes shifted dx = 0.1*(i%5), explicit shard column i%3) makes
    every lineage stat relationally derivable: 4 rows per shard,
    avg_sym_perc = avg over the shard of 2*(i%5), second pass skips 3."""
    import numpy as np
    import pandas as pd
    import shutil
    import tempfile

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig
    from brdrq_spark.sources.manifest import CommittedTable, checkpointed_align

    def sq(x0):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]])]
        )

    n = 12
    ref = spark.createDataFrame(
        pd.DataFrame([{"ref_id": f"r{i}", "geom_wkb": sq(20.0 * i)} for i in range(n)])
    )
    th = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "theme_id": f"t{i}",
                    "geom_wkb": sq(20.0 * i + 0.1 * (i % 5)),
                    "idx": i,
                }
                for i in range(n)
            ]
        )
    )
    root = tempfile.mkdtemp(prefix="brdrq_resume_")
    try:
        tab = CommittedTable(root)
        cfg = AlignConfig(relevant_distances=[2.0], od_strategy="EXCLUDE")
        first = checkpointed_align(
            spark, tab, th, ref, cfg, n_partitions=3, broadcast_ref=True,
            shard_col="idx",
        )
        second = checkpointed_align(
            spark, tab, th, ref, cfg, n_partitions=3, broadcast_ref=True,
            shard_col="idx",
        )
        rows = [
            {
                "partition": r["partition"],
                "row_count": int(r["row_count"]),
                "avg_sym_perc": float(r["avg_sym_perc"]),
                "first_computed": int(first["computed"]),
                "second_skipped": int(second["skipped_committed"]),
            }
            for r in tab.lineage()
        ]
        return spark.createDataFrame(pd.DataFrame(rows))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_image_invariants(spark, sf_dir):
    """input_hint per-row invariant ORACLE-CHECKED: after a tiling/
    shuffle pass, decoded pixels hash-equal and captions unchanged —
    the oracle enumerates the 16 deterministic image ids with both
    booleans true."""
    from brdrq_spark.operators.footprints import verify_invariants
    from brdrq_spark.sources.synthetic import images_table

    images = spark.createDataFrame(images_table(16, seed=8))
    shuffled = images.repartition(8, "phash").sortWithinPartitions("image_id")
    return verify_invariants(shuffled, images)


def q_align_reference_fixture(spark, sf_dir):
    """Golden parity: the reference plugin's own fixture scenario
    (plugin/brdrq/test/test_autocorrectborders.py:221-264) — 2 thematic
    polygons vs 342 CAPAKEY cadastral parcels at rd=2."""
    from brdrq_spark.operators.align import AlignConfig, align
    from brdrq_spark.sources.geojson import read_geojson

    fx = "/root/reference/plugin/brdrq/test"
    theme = read_geojson(
        spark, f"{fx}/themelayer_test.geojson", id_field="theme_identifier"
    ).select(F.col("feature_id").alias("theme_id"), "geom_wkb")
    ref = read_geojson(
        spark, f"{fx}/referencelayer_test.geojson", id_field="CAPAKEY"
    ).select(F.col("feature_id").alias("ref_id"), "geom_wkb")
    out = align(spark, theme, ref, AlignConfig(relevant_distances=[2.0]), broadcast_ref=True)
    return out.select(
        "theme_id",
        "brdr_relevant_distance",
        F.round("brdr_area", 2).alias("brdr_area"),
        F.round("brdr_sym_diff_area_index_perc", 2).alias("sym_diff_perc"),
        "brdr_nr_references",
        F.size("cell_ids").alias("n_cells"),
    )


def q_align_lines_snap(spark, sf_dir):
    """A10 vertex-strategy semantics ORACLE-CHECKED (SnapStrategy enum
    brdrq_utils.py:181-182; complements snaplines_closed_form's
    NO_PREFERENCE): vertical 8 m lines at dx = 0.2 + 0.08*(i%5) right
    of a parcel's right edge densify to 5 vertices (y = 1,3,5,7,9).
    Closed form per strategy:

    * ONLY_VERTICES: only the end vertices (y=1, y=9) have a parcel
      corner within rd=2 (hypot(dx,1) <= 2; mid vertices' nearest
      corner is hypot(dx,3) > 2) -> n_snapped = 2,
      max_move = sqrt(dx^2+1);
    * PREFER_VERTICES: ends snap to corners, mid vertices fall back to
      the boundary projection (move dx) -> n_snapped = 5, same
      max_move (sqrt(dx^2+1) > dx)."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.geom.wkb import lines_to_wkb
    from brdrq_spark.operators.snaplines import (
        SNAP_ONLY_VERTICES,
        SNAP_PREFER_VERTICES,
        align_lines,
    )

    n = 40
    refs, themes = [], []
    for i in range(n):
        x0 = 20.0 * i
        dx = 0.2 + 0.08 * (i % 5)
        refs.append(
            {
                "ref_id": f"r{i}",
                "geom_wkb": rings_to_wkb(
                    [
                        np.array(
                            [[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]]
                        )
                    ]
                ),
            }
        )
        line = np.array([[x0 + 10.0 + dx, 1.0], [x0 + 10.0 + dx, 9.0]])
        themes.append({"theme_id": f"t{i}", "geom_wkb": lines_to_wkb([line])})
    th = spark.createDataFrame(pd.DataFrame(themes))
    ref = spark.createDataFrame(pd.DataFrame(refs))
    outs = []
    for strat in (SNAP_ONLY_VERTICES, SNAP_PREFER_VERTICES):
        outs.append(
            align_lines(
                spark, th, ref, relevant_distance=2.0,
                snap_strategy=strat, broadcast_ref=True,
            ).select(
                "theme_id",
                F.lit(strat).alias("strategy"),
                F.col("n_vertices").cast("bigint").alias("n_vertices"),
                F.col("n_snapped").cast("bigint").alias("n_snapped"),
                F.round("max_move", 3).alias("max_move"),
            )
        )
    return outs[0].unionByName(outs[1])


def q_align_od_snap(spark, sf_dir):
    """A6 OD SNAP strategies ORACLE-CHECKED (reference default
    SNAP_ALL_SIDE, plugin/brdrq/brdrq_settings.py:162; semantics
    docs/autocorrectborders.md:188-193): themes of width w = 8 + 0.08i
    overlap a south parcel row and poke 0.5 m into a 1 m street.
    Closed form: the south overlap snaps to the full parcel (100 m²);
    SNAP_ALL_SIDE snaps the street frontage outward onto the north
    parcels (OD strip becomes w x 1 -> area 100 + w), SNAP_SINGLE_SIDE
    reverts outward snaps (strip stays w x 0.5 -> area 100 + w/2);
    sym% = 100*(area - 9.5w)/9.5w. Guard parcels i=6 equalize every
    theme's east/west candidate neighborhood (6 refs; t_0 has no west
    pair -> 4)."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import (
        OD_SNAP_ALL_SIDE,
        OD_SNAP_SINGLE_SIDE,
        AlignConfig,
        align,
    )

    refs, themes = [], []
    for i in range(7):
        # parcel pair i=6 is a guard neighborhood so every theme sees the
        # same east/west candidates — lineage stats become closed-form
        x0 = i * 12.0
        for side, y0 in (("s", 0.0), ("n", 11.0)):
            ring = np.array(
                [[x0, y0], [x0 + 10.0, y0], [x0 + 10.0, y0 + 10.0], [x0, y0 + 10.0]]
            )
            refs.append({"ref_id": f"{side}_{i}", "geom_wkb": rings_to_wkb([ring])})
        if i >= 6:
            continue
        t = np.array(
            [
                [x0 + 1.0, 1.0],
                [x0 + 9.0 + 0.08 * i, 1.0],
                [x0 + 9.0 + 0.08 * i, 10.5],
                [x0 + 1.0, 10.5],
            ]
        )
        themes.append({"theme_id": f"t_{i}", "geom_wkb": rings_to_wkb([t])})
    th = spark.createDataFrame(pd.DataFrame(themes))
    ref = spark.createDataFrame(pd.DataFrame(refs))
    outs = []
    for strat in (OD_SNAP_ALL_SIDE, OD_SNAP_SINGLE_SIDE):
        cfg = AlignConfig(relevant_distances=[2.0], od_strategy=strat)
        outs.append(
            align(spark, th, ref, cfg, broadcast_ref=True).select(
                F.lit(strat).alias("od_strategy"),
                "theme_id",
                F.round("brdr_area", 2).alias("brdr_area"),
                F.round("brdr_sym_diff_area_index_perc", 2).alias("sym_diff_perc"),
                "brdr_nr_references",
            )
        )
    return outs[0].unionByName(outs[1])


def q_align_dossier_network(spark, sf_dir):
    """A2 NetworkGeometryProcessor on the reference's own dossier fixture
    (plugin/brdrq/test/test_autocorrectborders.py:420-463: dossier_boom at
    rd=10, ENUM_PROCESSOR=2). The sandbox has no GRB remote, so the
    reference layer is the deterministic synthetic stand-in gridded under
    the dossier extent (SURVEY S3-S6 scope)."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import bbox, rings_from_wkb, rings_to_wkb
    from brdrq_spark.operators.network import align_network
    from brdrq_spark.sources.geojson import read_geojson

    th = read_geojson(
        spark,
        "/root/reference/plugin/brdrq/test/dossier_boom.geojson",
        id_field="dossiernummer",
    ).select(F.col("feature_id").alias("theme_id"), "geom_wkb")
    # deterministic parcel grid under the dossier bbox (20 m cells)
    wkbs = [r.geom_wkb for r in th.collect()]
    mnx, mny, mxx, mxy = bbox([ring for w in wkbs for ring in rings_from_wkb(w)])
    step = 20.0
    gx0, gy0 = step * np.floor(mnx / step) - step, step * np.floor(mny / step) - step
    refs = []
    nx = int((mxx - gx0) / step) + 2
    ny = int((mxy - gy0) / step) + 2
    for i in range(nx):
        for j in range(ny):
            x0, y0 = gx0 + i * step, gy0 + j * step
            refs.append(
                {
                    "ref_id": f"g_{i}_{j}",
                    "geom_wkb": rings_to_wkb(
                        [
                            np.array(
                                [
                                    [x0, y0],
                                    [x0 + step, y0],
                                    [x0 + step, y0 + step],
                                    [x0, y0 + step],
                                ]
                            )
                        ]
                    ),
                }
            )
    ref = spark.createDataFrame(pd.DataFrame(refs))
    out = align_network(spark, th, ref, relevant_distance=10.0, broadcast_ref=True)
    return out.select(
        "theme_id",
        "brdr_relevant_distance",
        F.round("brdr_area", 2).alias("brdr_area"),
        "n_vertices",
        "n_snapped",
        F.round("max_move", 3).alias("max_move"),
        "brdr_nr_references",
    )


def q_network_closed_form(spark, sf_dir):
    """A2 NetworkGeometryProcessor ORACLE-CHECKED on a shared-edge grid
    closed form (reference behavior: dossier features aligned with the
    NetworkGeometryProcessor keep common borders common,
    plugin/brdrq/test/test_autocorrectborders.py:408-463). Fixture: an
    8x5 grid of themes tiling the plane with EXACTLY shared edges at
    X_i = 10*i + (0.08*i - 0.3), Y_j = 10*j + (0.06*j - 0.2), over a
    9x6 grid of exact 10x10 reference parcels. At rd=2 every densified
    vertex snaps — corners PREFER_VERTICES onto parcel-grid corners,
    in-fill NO_PREFERENCE onto the nearest grid line — so each theme
    lands EXACTLY on its parcel: area 100.0 and result bbox
    (10i, 10j, 10i+10, 10j+10); adjacent outputs therefore still share
    their border (maxx of (i,j) == minx of (i+1,j) == 10(i+1), the
    network property, oracle-checked numerically). n_vertices =
    2*ceil(10.08/2) + 2*ceil(10.06/2) = 24, all snapped; max_move is
    the worst corner move sqrt(max(dxi², dxi1²) + max(dyj², dyj1²));
    nr_references mirrors the candidate plan exactly — the J2 bbox-gap
    refine (gap <= 2*rd = 4.0, align.py) is strictly finer than the
    res-10 (32 m) cell join at dilation 4.04, so the candidate set is
    precisely the parcels whose bbox gap to the theme bbox is <= 4.0."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.functions.geo import geo_features_udf
    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.network import align_network

    xs = [10.0 * i + (0.08 * i - 0.3) for i in range(9)]
    ys = [10.0 * j + (0.06 * j - 0.2) for j in range(6)]
    themes = [
        {
            "theme_id": f"t_{i}_{j}",
            "geom_wkb": rings_to_wkb(
                [
                    np.array(
                        [
                            [xs[i], ys[j]],
                            [xs[i + 1], ys[j]],
                            [xs[i + 1], ys[j + 1]],
                            [xs[i], ys[j + 1]],
                        ]
                    )
                ]
            ),
        }
        for i in range(8)
        for j in range(5)
    ]
    refs = [
        {
            "ref_id": f"g_{a}_{b}",
            "geom_wkb": rings_to_wkb(
                [
                    np.array(
                        [
                            [10.0 * a, 10.0 * b],
                            [10.0 * a + 10.0, 10.0 * b],
                            [10.0 * a + 10.0, 10.0 * b + 10.0],
                            [10.0 * a, 10.0 * b + 10.0],
                        ]
                    )
                ]
            ),
        }
        for a in range(9)
        for b in range(6)
    ]
    th = spark.createDataFrame(pd.DataFrame(themes))
    ref = spark.createDataFrame(pd.DataFrame(refs))
    out = align_network(spark, th, ref, relevant_distance=2.0, broadcast_ref=True)
    out = out.withColumn("f", geo_features_udf(10)(F.col("result_wkb")))
    return out.select(
        "theme_id",
        "brdr_relevant_distance",
        F.round("brdr_area", 2).alias("brdr_area"),
        "n_vertices",
        "n_snapped",
        F.round("max_move", 3).alias("max_move"),
        "brdr_nr_references",
        F.round("f.minx", 2).alias("minx"),
        F.round("f.miny", 2).alias("miny"),
        F.round("f.maxx", 2).alias("maxx"),
        F.round("f.maxy", 2).alias("maxy"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational / window / agg shapes (SURVEY.md §2 mapping in name)
        "tpch_q1_pricing_summary": q_tpch_q1,
        "p6_nonzero_filter": q_p6_nonzero_filter,
        "p9_text_search": q_p9_text_search,
        "p10_selection_semi_join": q_p10_selection_semi_join,
        "a13_changed_anti_join": q_a13_changed_anti_join,
        "g4_correction_chain": q_g4_correction_chain,
        "g7_state_counts": q_g7_state_counts,
        "w1_stability_runs": q_w1_stability_runs,
        "w2_best_argmax": q_w2_best_argmax,
        "w3_count_over": q_w3_count_over,
        "t3_topk_per_group": q_t3_topk_per_group,
        "g1_revenue_per_nation": q_g1_revenue_per_nation,
        "g5_minmax_events": q_g5_minmax_events,
        "sessionize_events": q_sessionize,
        "u3_set_except": q_u3_set_except,
        # training-pipeline operators
        "streaming_windowed_counts": q_streaming_windowed_counts,
        "f2_string_funcs": q_f2_string_funcs,
        "f3_date_buckets": q_f3_date_buckets,
        "f4_math_round": q_f4_math_round,
        "pivot_status_matrix": q_pivot_status_matrix,
        "dedup_exact": q_dedup_exact,
        "text_quality": q_text_quality,
        "langid_heuristic": q_langid,
        "token_counts": q_token_counts,
        "similarity_cosine": q_similarity_cosine,
        "cell_cover": q_cell_cover,
        "align_rect_closed_form": q_align_rect_closed_form,
        "diff_metrics_series": q_diff_metrics_series,
        "evaluate_closed_form": q_evaluate_closed_form,
        "classify_closed_form": q_classify_closed_form,
        "snaplines_closed_form": q_snaplines_closed_form,
        "temporal_closed_form": q_temporal_closed_form,
        "sosa_lineage_roundtrip": q_sosa_lineage_roundtrip,
        "knn_closed_form": q_knn_closed_form,
        "minhash_lsh_candidates": q_minhash_lsh,
        "simhash_signatures": q_simhash,
        "knn_bucketed": q_knn_bucketed,
        # geometry-native / engine-native (rows-only)
        "align_flagship": q_align_flagship,
        "align_reference_fixture": q_align_reference_fixture,
        "align_lines_snap": q_align_lines_snap,
        "align_od_snap": q_align_od_snap,
        "network_closed_form": q_network_closed_form,
        "footprint_extraction": q_footprint_extraction,
        "evaluate_prediction_sweep": q_evaluate_prediction_sweep,
        "classify_correction": q_classify_correction,
        "knn_boundary_segments": q_knn_boundary,
        "streaming_sessionize": q_streaming_sessionize,
        "align_topology": q_align_topology,
        "resume_lineage": q_resume_lineage,
        "image_invariants": q_image_invariants,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tpch_q1_pricing_summary": """
          SELECT l_returnflag, l_linestatus,
                 round(sum(l_quantity), 2)                         AS sum_qty,
                 round(sum(l_extendedprice), 2)                    AS sum_base_price,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                 round(avg(l_quantity), 4)                         AS avg_qty,
                 count(*)                                          AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          GROUP BY l_returnflag, l_linestatus
        """,
        "p6_nonzero_filter": """
          SELECT l_orderkey, l_linenumber, l_discount
          FROM lineitem WHERE l_discount != 0
        """,
        "p9_text_search": """
          -- the 15 selected fields (8 keyword-matched + 7 fill); the
          -- capped-off o_orderdate / o_orderpriority are ABSENT
          SELECT l_orderkey, l_linenumber
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE contains(lower(l_orderkey::VARCHAR), '-05-2')
             OR contains(lower(l_partkey::VARCHAR), '-05-2')
             OR contains(lower(l_suppkey::VARCHAR), '-05-2')
             OR contains(lower(l_linenumber::VARCHAR), '-05-2')
             OR contains(lower(l_linestatus::VARCHAR), '-05-2')
             OR contains(lower(o_orderkey::VARCHAR), '-05-2')
             OR contains(lower(o_custkey::VARCHAR), '-05-2')
             OR contains(lower(o_orderstatus::VARCHAR), '-05-2')
             OR contains(lower(l_quantity::VARCHAR), '-05-2')
             OR contains(lower(l_extendedprice::VARCHAR), '-05-2')
             OR contains(lower(l_discount::VARCHAR), '-05-2')
             OR contains(lower(l_tax::VARCHAR), '-05-2')
             OR contains(lower(l_returnflag::VARCHAR), '-05-2')
             OR contains(lower(l_shipdate::VARCHAR), '-05-2')
             OR contains(lower(o_totalprice::VARCHAR), '-05-2')
        """,
        "p10_selection_semi_join": """
          SELECT o_orderkey FROM orders
          WHERE EXISTS (SELECT 1 FROM customer
                        WHERE c_custkey = o_custkey AND c_acctbal > 5000)
        """,
        "a13_changed_anti_join": """
          SELECT c_custkey FROM customer
          WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "cell_cover": """
          WITH pts AS (
            SELECT o_orderkey,
                   (o_orderkey % 1000)::DOUBLE * 3.7 - 1850.0 AS x,
                   (o_custkey % 997)::DOUBLE * 2.3 - 1150.0 AS y
            FROM orders
          ), idx AS (
            -- cell indices: floor((coord + bias) / cell_size), res 10 ->
            -- 32 m cells, bias 2^22 (brdrq_spark/grid.py:26-34, 73-78)
            SELECT o_orderkey, x, y,
                   floor((x + 4194304.0) / 32.0)::BIGINT AS ix,
                   floor((y + 4194304.0) / 32.0)::BIGINT AS iy
            FROM pts
          ), sx AS (
            -- Morton spread of ix (grid.py:50-59), stage by stage
            SELECT *, (ix & 536870911) AS v FROM idx
          ), sx1 AS (SELECT *, (v | (v << 16)) & 281470681808895 AS v1 FROM sx
          ), sx2 AS (SELECT *, (v1 | (v1 << 8)) & 71777214294589695 AS v2 FROM sx1
          ), sx3 AS (SELECT *, (v2 | (v2 << 4)) & 1085102592571150095 AS v3 FROM sx2
          ), sx4 AS (SELECT *, (v3 | (v3 << 2)) & 3689348814741910323 AS v4 FROM sx3
          ), sx5 AS (SELECT *, (v4 | (v4 << 1)) & 6148914691236517205 AS px FROM sx4
          ), sy AS (SELECT *, (iy & 536870911) AS w FROM sx5
          ), sy1 AS (SELECT *, (w | (w << 16)) & 281470681808895 AS w1 FROM sy
          ), sy2 AS (SELECT *, (w1 | (w1 << 8)) & 71777214294589695 AS w2 FROM sy1
          ), sy3 AS (SELECT *, (w2 | (w2 << 4)) & 1085102592571150095 AS w3 FROM sy2
          ), sy4 AS (SELECT *, (w3 | (w3 << 2)) & 3689348814741910323 AS w4 FROM sy3
          ), sy5 AS (SELECT *, (w4 | (w4 << 1)) & 6148914691236517205 AS py FROM sy4
          )
          SELECT o_orderkey, round(x, 4) AS x, round(y, 4) AS y,
                 (px | (py << 1)) | (10::BIGINT << 58) AS cell_id
          FROM sy5
        """,
        "align_rect_closed_form": """
          SELECT 't' || i AS theme_id,
                 100.0::DOUBLE AS brdr_area,
                 40.0::DOUBLE AS brdr_perimeter,
                 round(2.0 * (i % 5), 2)::DOUBLE AS sym_area,
                 1 AS brdr_nr_references
          FROM range(40) t(i)
        """,
        "sosa_lineage_roundtrip": """
          SELECT 't' || i AS theme_id,
                 'r' || i AS ref_id,
                 '2024-01-01' AS version_date
          FROM range(40) t(i)
        """,
        "snaplines_closed_form": """
          SELECT 't' || i AS theme_id,
                 5::BIGINT AS n_vertices,
                 5::BIGINT AS n_snapped,
                 round(0.2 + 0.1 * (i % 5)::DOUBLE, 3) AS max_move,
                 '' AS brdr_remark
          FROM range(40) t(i)
        """,
        "align_lines_snap": """
          -- dx = 0.2 + 0.08*(i%5); ONLY_VERTICES snaps the two end
          -- vertices to parcel corners (move sqrt(dx^2+1)); mid
          -- vertices' nearest corner is > rd away. PREFER_VERTICES
          -- additionally snaps the 3 mid vertices to the boundary
          -- (move dx < sqrt(dx^2+1)); max_move identical.
          SELECT 't' || i AS theme_id,
                 s.strategy,
                 5::BIGINT AS n_vertices,
                 (CASE WHEN s.strategy = 'ONLY_VERTICES' THEN 2 ELSE 5
                  END)::BIGINT AS n_snapped,
                 round(sqrt((0.2 + 0.08 * (i % 5)::DOUBLE)
                            * (0.2 + 0.08 * (i % 5)::DOUBLE) + 1.0),
                       3) AS max_move
          FROM range(40) t(i),
               (SELECT 'ONLY_VERTICES' AS strategy
                UNION ALL SELECT 'PREFER_VERTICES') s
        """,
        "temporal_closed_form": """
          SELECT 't' || i AS theme_id,
                 2.0::DOUBLE AS brdr_relevant_distance,
                 CASE WHEN i % 7 = 0 THEN ''
                      ELSE 'unchanged_reference' END AS brdr_remark
          FROM range(40) t(i)
        """,
        "classify_closed_form": """
          -- unshifted themes now evaluate equality_by_full_reference
          -- (they equal their full parcel), which classify routes to
          -- auto_updated (reference brdrq_utils.py:1266-1271 passes the
          -- equality evals through every review branch)
          SELECT 't' || i AS theme_id,
                 'auto_updated' AS brdrq_state,
                 round(2.0 * (i % 5), 2)::DOUBLE AS sym_area
          FROM range(40) t(i)
        """,
        "evaluate_closed_form": """
          SELECT 't' || i AS theme_id,
                 (CASE WHEN i % 5 = 0 THEN 0.0 ELSE 0.5 END)::DOUBLE
                   AS brdr_relevant_distance,
                 (CASE WHEN i % 5 = 0 THEN 5.0 ELSE 4.0 END)::DOUBLE
                   AS brdr_prediction_score,
                 1::BIGINT AS brdr_prediction_count,
                 CASE WHEN i % 20 = 0 THEN 'equality_by_id_and_full_reference'
                      WHEN i % 20 = 10 THEN 'equality_by_id'
                      WHEN i % 10 = 5 THEN 'equality_by_full_reference'
                      ELSE 'prediction_unique' END AS brdr_evaluation,
                 round(2.0 * (i % 5), 2)::DOUBLE AS sym_area
          FROM range(40) t(i)
        """,
        "diff_metrics_series": """
          SELECT 't' || i AS theme_id,
                 rd::DOUBLE AS brdr_relevant_distance,
                 100.0::DOUBLE AS brdr_area,
                 round(2.0 * (i % 5), 2)::DOUBLE AS sym_area,
                 round(2.0 * (i % 5), 2)::DOUBLE AS sym_perc,
                 0.0::DOUBLE AS diff_area_idx,
                 (CASE WHEN rd = 0.5 THEN NULL ELSE 0.0 END)::DOUBLE AS delta_sym
          FROM range(40) t(i), (VALUES (0.5), (1.0), (2.0)) g(rd)
        """,
        "streaming_sessionize": """
          -- generator mirror: user u's six events are 100s apart except a
          -- 700s gap whenever (u+j)%3==0; j=0 never starts a new session,
          -- so n_sessions = 1 + |{j in 1..5 : (u+j)%3==0}|
          SELECT i AS user_id,
                 (CASE WHEN i % 3 = 0 THEN 2 ELSE 3 END)::BIGINT AS n_sessions,
                 6::BIGINT AS n_events
          FROM range(1, 9) t(i)
        """,
        "knn_closed_form": """
          WITH base AS (
            SELECT i, 20.0 * i AS x0,
                   0.2 + 0.1 * (i % 5) AS dx, 0.15::DOUBLE AS dy
            FROM range(40) r(i)
          ), v AS (
            SELECT i, x0, vi,
              CASE vi WHEN 0 THEN x0 + dx WHEN 1 THEN x0 + 10.0 + dx
                      WHEN 2 THEN x0 + 10.0 + dx ELSE x0 + dx END AS px,
              CASE vi WHEN 0 THEN dy WHEN 1 THEN dy
                      ELSE 10.0 + dy END AS py
            FROM base, range(4) q(vi)
          ), e AS (
            -- ring (x0,0)(x0+10,0)(x0+10,10)(x0,10): seg j = v_j -> v_j+1
            SELECT i AS ei, si,
              CASE si WHEN 0 THEN x0 WHEN 1 THEN x0 + 10.0
                      WHEN 2 THEN x0 + 10.0 ELSE x0 END AS ax,
              CASE si WHEN 0 THEN 0.0 WHEN 1 THEN 0.0
                      WHEN 2 THEN 10.0 ELSE 10.0 END AS ay,
              CASE si WHEN 0 THEN x0 + 10.0 WHEN 1 THEN x0 + 10.0
                      WHEN 2 THEN x0 ELSE x0 END AS bx,
              CASE si WHEN 0 THEN 0.0 WHEN 1 THEN 10.0
                      WHEN 2 THEN 10.0 ELSE 0.0 END AS by
            FROM base, range(4) q(si)
          ), d AS (
            SELECT v.i, v.vi, e.si,
              sqrt(
                (v.px - (e.ax + t.tt * (e.bx - e.ax))) ^ 2
                + (v.py - (e.ay + t.tt * (e.by - e.ay))) ^ 2
              ) AS dist
            FROM v
            JOIN e ON e.ei = v.i,
            LATERAL (
              SELECT greatest(0.0, least(1.0,
                ((v.px - e.ax) * (e.bx - e.ax) + (v.py - e.ay) * (e.by - e.ay))
                / ((e.bx - e.ax) ^ 2 + (e.by - e.ay) ^ 2))) AS tt
            ) t
          ), ranked AS (
            SELECT i, vi, si, dist,
                   row_number() OVER (PARTITION BY i, vi
                                      ORDER BY dist, si) AS rk
            FROM d WHERE dist <= 8.0
          )
          SELECT 't' || i AS theme_id, vi AS vertex_idx, 'r' || i AS ref_id,
                 si AS seg_idx, round(dist, 4) AS dist, rk AS rank
          FROM ranked WHERE rk <= 2
        """,
        "g4_correction_chain": """
          WITH e AS (
            SELECT o_orderkey AS theme_id,
                   (o_orderkey % 23 = 0) AS no_pred,
                   (o_orderkey % 10 = 0) AS multi,
                   CASE WHEN o_orderkey % 13 = 0 THEN 'no_change'
                        WHEN o_orderkey % 13 = 1 THEN 'equality_by_id'
                        ELSE 'prediction_unique' END AS ev,
                   ((o_orderkey % 19 = 0)
                    OR (CASE WHEN o_orderkey % 17 = 0 THEN 0.0 ELSE 100.0 END) <= 0)
                     AS empty_geom,
                   (o_orderkey % 11 = 0) AS unstable,
                   (floor(o_totalprice)::BIGINT % 100) / 2.0 AS sym_perc,
                   (floor(o_totalprice)::BIGINT % 7) / 100.0 AS sym_area
            FROM orders
          ), f AS (
            SELECT *,
                   (ev = 'no_change') AS no_change,
                   (ev LIKE 'equality%') AS eq
            FROM e
          ), g AS (
            SELECT *,
              (NOT no_change AND NOT eq AND (empty_geom OR unstable)) AS to_align,
              (NOT no_change AND NOT eq AND NOT empty_geom AND NOT unstable
               AND sym_perc > 10.0) AS review_sym,
              (NOT no_change AND NOT eq AND NOT empty_geom AND NOT unstable
               AND NOT (sym_perc > 10.0) AND sym_area < 0.01) AS small
            FROM f
          )
          SELECT theme_id,
            CASE WHEN no_pred OR to_align THEN 'to_update'
                 WHEN multi OR review_sym THEN 'to_review'
                 WHEN no_change OR small THEN 'not_changed'
                 ELSE 'auto_updated' END AS brdrq_state,
            round(CASE WHEN no_pred OR to_align THEN -1.0 ELSE sym_area END, 2)
              AS sym_area,
            round(CASE WHEN no_pred OR to_align THEN -1.0 ELSE sym_perc END, 2)
              AS sym_perc
          FROM g
        """,
        "g7_state_counts": """
          SELECT CASE WHEN o_orderstatus = 'F' AND o_totalprice < 1000 THEN 'not_changed'
                      WHEN o_totalprice > 50000                        THEN 'to_review'
                      WHEN o_orderpriority LIKE '1%'                   THEN 'auto_updated'
                      ELSE 'none' END AS brdrq_state,
                 count(*) AS n
          FROM orders GROUP BY 1
        """,
        "w1_stability_runs": _W1_SQL,
        "w2_best_argmax": """
          SELECT o_custkey, o_orderkey
          FROM (SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) t
          WHERE rn = 1
        """,
        "w3_count_over": """
          SELECT o_orderkey,
                 count(*) OVER (PARTITION BY o_custkey) AS n_orders_of_cust
          FROM orders
        """,
        "t3_topk_per_group": """
          SELECT p_brand, p_partkey, p_retailprice
          FROM (SELECT p_brand, p_partkey, p_retailprice,
                       row_number() OVER (PARTITION BY p_brand
                                          ORDER BY p_retailprice DESC, p_partkey) AS rn
                FROM part) t
          WHERE rn <= 3
        """,
        "g1_revenue_per_nation": """
          SELECT n_name,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          GROUP BY n_name
        """,
        "g5_minmax_events": """
          SELECT event_type, round(min(value), 4) AS min_v, round(max(value), 4) AS max_v,
                 round(avg(value), 4) AS avg_v, count(*) AS n
          FROM events GROUP BY event_type
        """,
        "sessionize_events": """
          SELECT user_id, (sum(flag) + 1)::BIGINT AS n_sessions
          FROM (SELECT user_id,
                       CASE WHEN epoch_us(ts) -
                                 lag(epoch_us(ts)) OVER
                                 (PARTITION BY user_id ORDER BY ts, event_id) > 600000000
                            THEN 1 ELSE 0 END AS flag
                FROM events) t
          GROUP BY user_id
        """,
        "u3_set_except": """
          SELECT DISTINCT source FROM documents WHERE lang = 'en'
          EXCEPT
          SELECT DISTINCT source FROM documents WHERE lang = 'de'
        """,
        "pivot_status_matrix": """
          SELECT l_returnflag,
                 round(coalesce(sum(CASE WHEN l_linestatus = 'O'
                                         THEN l_quantity END), 0), 2) AS qty_o,
                 round(coalesce(sum(CASE WHEN l_linestatus = 'F'
                                         THEN l_quantity END), 0), 2) AS qty_f
          FROM lineitem GROUP BY l_returnflag
        """,
        "dedup_exact": """
          SELECT min(doc_id) AS doc_id, count(*) AS n_copies
          FROM (SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS t
                FROM documents) d
          GROUP BY t
        """,
        "text_quality": """
          SELECT doc_id,
                 length(text) AS n_chars_q,
                 round(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0
                       / greatest(length(text), 1), 4) AS alpha_ratio,
                 len(string_split(trim(text), ' ')) AS n_tokens,
                 round((
                   (length(lower(text)) - length(replace(lower(text), 'value', ''))) / 5
                 + (length(lower(text)) - length(replace(lower(text), 'table', ''))) / 5
                 + (length(lower(text)) - length(replace(lower(text), 'data', ''))) / 4
                 ) * 1.0 / greatest(len(string_split(trim(text), ' ')), 1), 4)
                 AS stopword_ratio
          FROM documents
        """,
        "langid_heuristic": """
          WITH s AS (
            SELECT doc_id, lower(text) AS t FROM documents
          )
          SELECT doc_id,
            ((length(t)-length(replace(t,'table','')))/5
            +(length(t)-length(replace(t,'scan','')))/4
            +(length(t)-length(replace(t,'filter','')))/6
            +(length(t)-length(replace(t,'order','')))/5)::BIGINT  AS score_sql,
            ((length(t)-length(replace(t,'spark','')))/5
            +(length(t)-length(replace(t,'batch','')))/5
            +(length(t)-length(replace(t,'window','')))/6
            +(length(t)-length(replace(t,'column','')))/6)::BIGINT AS score_spark,
            ((length(t)-length(replace(t,'value','')))/5
            +(length(t)-length(replace(t,'small','')))/5
            +(length(t)-length(replace(t,'fast','')))/4
            +(length(t)-length(replace(t,'slow','')))/4)::BIGINT   AS score_plain,
            CASE WHEN ((length(t)-length(replace(t,'table','')))/5
                      +(length(t)-length(replace(t,'scan','')))/4
                      +(length(t)-length(replace(t,'filter','')))/6
                      +(length(t)-length(replace(t,'order','')))/5)
                   >= ((length(t)-length(replace(t,'spark','')))/5
                      +(length(t)-length(replace(t,'batch','')))/5
                      +(length(t)-length(replace(t,'window','')))/6
                      +(length(t)-length(replace(t,'column','')))/6)
                  AND ((length(t)-length(replace(t,'table','')))/5
                      +(length(t)-length(replace(t,'scan','')))/4
                      +(length(t)-length(replace(t,'filter','')))/6
                      +(length(t)-length(replace(t,'order','')))/5)
                   >= ((length(t)-length(replace(t,'value','')))/5
                      +(length(t)-length(replace(t,'small','')))/5
                      +(length(t)-length(replace(t,'fast','')))/4
                      +(length(t)-length(replace(t,'slow','')))/4)
                 THEN 'sql'
                 WHEN ((length(t)-length(replace(t,'spark','')))/5
                      +(length(t)-length(replace(t,'batch','')))/5
                      +(length(t)-length(replace(t,'window','')))/6
                      +(length(t)-length(replace(t,'column','')))/6)
                   >= ((length(t)-length(replace(t,'value','')))/5
                      +(length(t)-length(replace(t,'small','')))/5
                      +(length(t)-length(replace(t,'fast','')))/4
                      +(length(t)-length(replace(t,'slow','')))/4)
                 THEN 'spark'
                 ELSE 'plain' END AS lang_guess
          FROM s
        """,
        "token_counts": """
          SELECT doc_id,
                 len(string_split(trim(text), ' ')) AS n_tokens_ws,
                 len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                 x -> x != '')) AS n_tokens_bpe
          FROM documents
        """,
        "similarity_cosine": """
          SELECT e.vec_id,
                 round(list_inner_product(e.embedding::DOUBLE[], q.qv)
                       / (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                        * sqrt(list_inner_product(q.qv, q.qv))), 3) AS cosine
          FROM embeddings e,
               (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
          WHERE e.vec_id != 0 AND e.vec_id < 50
        """,
        "simhash_signatures": """
          SELECT a AS doc_id, true AS dup_sig_equal, true AS neighbor_differs
          FROM (SELECT min(doc_id) AS a FROM documents
                WHERE doc_id < 40 GROUP BY text) t
        """,
        "image_invariants": """
          SELECT 'img_0008_' || lpad(i::VARCHAR, 6, '0') AS image_id,
                 true AS pixels_ok, true AS caption_ok
          FROM range(16) t(i)
        """,
        "minhash_lsh_candidates": """
          -- planted byte-identical duplicates: candidates are exactly the
          -- (i, i+10000) pairs over the text-distinct base docs
          SELECT a, a + 10000 AS b
          FROM (SELECT min(doc_id) AS a FROM documents
                WHERE doc_id < 40 GROUP BY text) t
        """,
        "footprint_extraction": """
          -- rectangle masks: fp_area is exactly rw*rh m² (pixel scale 1)
          SELECT 'fp_rect_' || lpad(i::VARCHAR, 4, '0') AS theme_id,
                 'rect_' || lpad(i::VARCHAR, 4, '0') AS image_id,
                 ((4 + i % 7) * (3 + i % 5))::DOUBLE AS fp_area,
                 'rect ' || (4 + i % 7) || 'x' || (3 + i % 5) || ' image ' || i
                   AS caption
          FROM range(24) t(i)
        """,
        "align_od_snap": """
          WITH t AS (
            SELECT i, (8.0::DOUBLE + 0.08::DOUBLE * i) AS w FROM range(6) r(i)
          ), s AS (
            SELECT 'SNAP_ALL_SIDE' AS od_strategy, i, w,
                   100.0::DOUBLE + w AS area FROM t
            UNION ALL
            SELECT 'SNAP_SINGLE_SIDE', i, w,
                   100.0::DOUBLE + 0.5::DOUBLE * w FROM t
          )
          SELECT od_strategy, 't_' || i AS theme_id,
                 round(area, 2)::DOUBLE AS brdr_area,
                 round(100.0::DOUBLE * (area - w * 9.5) / (w * 9.5), 2)::DOUBLE
                   AS sym_diff_perc,
                 CASE WHEN i = 0 THEN 4 ELSE 6 END AS brdr_nr_references
          FROM s
        """,
        "network_closed_form": """
          -- shared-edge grid closed form: every theme snaps exactly onto
          -- its 10x10 parcel (area 100, bbox on the 10 m grid — adjacent
          -- rows share their border coordinate); 24 densified vertices
          -- all snap; max_move is the worst corner move; nr_references
          -- mirrors the J2 bbox-gap refine (gap <= 2*rd = 4.0), which is
          -- strictly finer than the 32 m cell join it follows
          WITH t AS (
            SELECT i, j,
                   10.0::DOUBLE*i + (0.08::DOUBLE*i - 0.3::DOUBLE)             AS tx0,
                   10.0::DOUBLE*(i+1) + (0.08::DOUBLE*(i+1) - 0.3::DOUBLE)     AS tx1,
                   10.0::DOUBLE*j + (0.06::DOUBLE*j - 0.2::DOUBLE)             AS ty0,
                   10.0::DOUBLE*(j+1) + (0.06::DOUBLE*(j+1) - 0.2::DOUBLE)     AS ty1
            FROM range(8) ri(i), range(5) rj(j)
          ),
          nr AS (
            SELECT t.i, t.j, count(*)::INT AS nr
            FROM t, (SELECT a, b FROM range(9) ra(a), range(6) rb(b)) p
            WHERE sqrt(
                    pow(greatest(tx0 - (10.0::DOUBLE*a + 10.0::DOUBLE), 10.0::DOUBLE*a - tx1, 0.0), 2)
                  + pow(greatest(ty0 - (10.0::DOUBLE*b + 10.0::DOUBLE), 10.0::DOUBLE*b - ty1, 0.0), 2)
                  ) <= 4.0
            GROUP BY t.i, t.j
          )
          SELECT 't_' || t.i || '_' || t.j AS theme_id,
                 2.0::DOUBLE   AS brdr_relevant_distance,
                 100.0::DOUBLE AS brdr_area,
                 24 AS n_vertices,
                 24 AS n_snapped,
                 round(sqrt(
                     greatest(pow(tx0 - 10.0::DOUBLE*t.i, 2), pow(tx1 - 10.0::DOUBLE*(t.i+1), 2))
                   + greatest(pow(ty0 - 10.0::DOUBLE*t.j, 2), pow(ty1 - 10.0::DOUBLE*(t.j+1), 2))
                 ), 3) AS max_move,
                 nr.nr AS brdr_nr_references,
                 round(10.0::DOUBLE*t.i, 2)        AS minx,
                 round(10.0::DOUBLE*t.j, 2)        AS miny,
                 round(10.0::DOUBLE*t.i + 10.0::DOUBLE, 2) AS maxx,
                 round(10.0::DOUBLE*t.j + 10.0::DOUBLE, 2) AS maxy
          FROM t JOIN nr ON t.i = nr.i AND t.j = nr.j
        """,
        "align_topology": """
          -- every theme snaps exactly onto its parcel; each square has 4
          -- edges, exactly 1 of which (the common border) is shared
          SELECT s || lpad(i::VARCHAR, 2, '0') AS theme_id,
                 100.0::DOUBLE AS brdr_area,
                 0.0::DOUBLE AS sym_vs_parcel,
                 4 AS n_edges,
                 1 AS n_shared_edges
          FROM range(20) t(i), (VALUES ('a'), ('b')) v(s)
        """,
        "resume_lineage": """
          -- shard s = i % 3 over 12 themes: 4 rows each; sym% of theme i
          -- is exactly 2*(i%5) (closed-form rectangle fixture); the
          -- second checkpointed pass skips all 3 committed shards
          WITH t AS (
            SELECT i, i % 3 AS s, 2.0::DOUBLE * (i % 5) AS perc
            FROM range(12) r(i)
          )
          SELECT 'shard_' || lpad(s::VARCHAR, 3, '0') AS partition,
                 count(*)::BIGINT AS row_count,
                 round(avg(perc), 4) AS avg_sym_perc,
                 3::BIGINT AS first_computed,
                 3::BIGINT AS second_skipped
          FROM t GROUP BY s
        """,
        "knn_bucketed": """
          -- planted exact duplicates: each query (vec_id + 1000000) is a
          -- byte-identical copy of corpus vector i, so its rank-1 ANN
          -- neighbor is i at cosine 1.0 (no other corpus vector exceeds
          -- cosine 0.5 of vectors 0..19 — verified on the fixture)
          SELECT (i + 1000000)::BIGINT AS q_id, i::BIGINT AS c_id,
                 1.0::DOUBLE AS cosine, 1::BIGINT AS rank
          FROM range(20) t(i)
        """,
        "streaming_windowed_counts": """
          SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS win_start_epoch,
                 event_type,
                 count(*) AS n,
                 round(sum(value), 4) AS sum_value
          FROM events GROUP BY 1, 2
        """,
        "f2_string_funcs": """
          SELECT c_custkey,
                 upper(substr(c_name, 1, 8))          AS name_prefix,
                 concat(c_mktsegment, '#', c_custkey) AS seg_key,
                 cast(length(replace(c_name, ' ', '')) AS bigint) AS name_len_nospace
          FROM customer
        """,
        "f3_date_buckets": """
          SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
                 count(*) AS n,
                 round(sum(o_totalprice), 2) AS month_total
          FROM orders GROUP BY 1
        """,
        "f4_math_round": """
          SELECT l_orderkey, l_linenumber,
                 cast(floor(l_extendedprice * 100) AS bigint) AS price_cents,
                 round(l_discount * 100, 1)                   AS discount_pct,
                 cast(abs(l_quantity - 25) AS double)         AS qty_dev
          FROM lineitem WHERE l_linenumber = 1
        """,
    }
