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
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT doc_id, lang, source FROM documents
      WHERE lower(text) LIKE '%window%'
    """)


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


def q_g4_case_chain(spark, sf_dir):
    _views(spark, sf_dir)
    return spark.sql("""
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'F' AND o_totalprice < 1000 THEN 'not_changed'
                  WHEN o_totalprice > 50000                        THEN 'to_review'
                  WHEN o_orderpriority LIKE '1%'                   THEN 'auto_updated'
                  ELSE 'none' END AS brdrq_state
      FROM orders
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
      SELECT user_id, (sum(flag) + 1) AS n_sessions
      FROM (SELECT user_id,
                   CASE WHEN unix_timestamp(ts) -
                             lag(unix_timestamp(ts)) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id) > 600
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
    from brdrq_spark.operators.footprints import extract_footprints
    from brdrq_spark.sources.synthetic import images_table

    images = spark.createDataFrame(images_table(24, seed=11))
    return extract_footprints(images).select(
        "theme_id", "image_id", F.round("fp_area", 2).alias("fp_area"), "caption", "pixel_sha"
    )


def q_evaluate_prediction_sweep(spark, sf_dir):
    from brdrq_spark.operators.evaluate import evaluate

    th, ref = _synthetic_align_inputs(spark, n_theme=6, grid=10, seed=5)
    out = evaluate(spark, th, ref, max_rd=2.0, step=0.5, broadcast_ref=True)
    return out.select(
        "theme_id",
        "brdr_relevant_distance",
        "brdr_stability",
        "brdr_prediction_score",
        "brdr_prediction_count",
        "brdr_evaluation",
    )


def q_classify_correction(spark, sf_dir):
    from brdrq_spark.operators.classify import classify_correction
    from brdrq_spark.operators.evaluate import evaluate

    th, ref = _synthetic_align_inputs(spark, n_theme=6, grid=10, seed=5)
    ev = evaluate(spark, th, ref, max_rd=2.0, step=0.5, broadcast_ref=True)
    return classify_correction(th, ev).select("theme_id", "brdrq_state")


def q_minhash_lsh(spark, sf_dir):
    from brdrq_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures, shingles

    docs = _doc(spark, sf_dir)
    sigs = minhash_signatures(shingles(docs, k=3), num_perm=16)
    return lsh_candidate_pairs(sigs, bands=8)


def q_simhash(spark, sf_dir):
    from brdrq_spark.operators.dedup import simhash

    return simhash(_doc(spark, sf_dir))


def q_knn_bucketed(spark, sf_dir):
    from brdrq_spark.operators.similarity import knn_join_bucketed

    emb = _emb(spark, sf_dir)
    return knn_join_bucketed(emb, emb.limit(20), k=5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational / window / agg shapes (SURVEY.md §2 mapping in name)
        "tpch_q1_pricing_summary": q_tpch_q1,
        "p6_nonzero_filter": q_p6_nonzero_filter,
        "p9_text_search": q_p9_text_search,
        "p10_selection_semi_join": q_p10_selection_semi_join,
        "a13_changed_anti_join": q_a13_changed_anti_join,
        "g4_case_chain": q_g4_case_chain,
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
        "dedup_exact": q_dedup_exact,
        "text_quality": q_text_quality,
        "langid_heuristic": q_langid,
        "token_counts": q_token_counts,
        "similarity_cosine": q_similarity_cosine,
        "minhash_lsh_candidates": q_minhash_lsh,
        "simhash_signatures": q_simhash,
        "knn_bucketed": q_knn_bucketed,
        # geometry-native (rows-only)
        "align_flagship": q_align_flagship,
        "footprint_extraction": q_footprint_extraction,
        "evaluate_prediction_sweep": q_evaluate_prediction_sweep,
        "classify_correction": q_classify_correction,
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
          SELECT doc_id, lang, source FROM documents
          WHERE lower(text) LIKE '%window%'
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
        "g4_case_chain": """
          SELECT o_orderkey,
                 CASE WHEN o_orderstatus = 'F' AND o_totalprice < 1000 THEN 'not_changed'
                      WHEN o_totalprice > 50000                        THEN 'to_review'
                      WHEN o_orderpriority LIKE '1%'                   THEN 'auto_updated'
                      ELSE 'none' END AS brdrq_state
          FROM orders
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
          SELECT user_id, (sum(flag) + 1) AS n_sessions
          FROM (SELECT user_id,
                       CASE WHEN epoch(ts)::BIGINT -
                                 lag(epoch(ts)::BIGINT) OVER
                                 (PARTITION BY user_id ORDER BY ts, event_id) > 600
                            THEN 1 ELSE 0 END AS flag
                FROM events) t
          GROUP BY user_id
        """,
        "u3_set_except": """
          SELECT DISTINCT source FROM documents WHERE lang = 'en'
          EXCEPT
          SELECT DISTINCT source FROM documents WHERE lang = 'de'
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
    }
