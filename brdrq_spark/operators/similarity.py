"""Similarity search over embedding columns (array<float>).

Brute-force cosine scoring with built-in higher-order functions
(`aggregate`/`zip_with` — JVM-side, no Python) as the correctness
baseline, plus an LSH-bucketed variant (sign-signature over leading
dimensions) as the scale path: at 100 TB the bucket equi-join confines
the quadratic pair space to same-bucket candidates, and the bucket key
is a plain int64 column Catalyst can shuffle-partition / AQE-skew-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of one vector (brute force scan).

    The query vector rides along as a broadcast single-row cross join —
    a map-only scan over the corpus, fully parallel, no shuffle until
    the final top-k (orderBy + limit → TakeOrdered)."""
    q = emb.where(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("qv")
    )
    v = F.col(vec_col).cast("array<double>")
    return (
        emb.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(_dot(v, F.col("qv")) / (_norm(v) * _norm(F.col("qv"))), 3).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def knn_join_bucketed(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bucket_dims: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate kNN join: sign-signature buckets + per-bucket scoring.

    Recall is traded for the elimination of the full cross join; multi-
    probe (flipping one signature bit) can be unioned in for higher
    recall at 2x candidate cost.
    """
    def with_bucket(df, prefix):
        v = F.col(vec_col).cast("array<double>")
        sig = F.aggregate(
            F.zip_with(
                F.slice(v, 1, bucket_dims),
                F.sequence(F.lit(0), F.lit(bucket_dims - 1)).cast("array<double>"),
                lambda x, i: F.when(
                    x > 0, F.pow(F.lit(2.0), i).cast("long")
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        )
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            v.alias(f"{prefix}_vec"),
            sig.alias("bucket"),
        )

    c = with_bucket(emb, "c")
    q = with_bucket(queries, "q")
    scored = (
        q.join(c, "bucket")
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
                3,
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
