"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (a desktop alignment tool) but mandated as
first-class engine components for the 100 TB target. All operators are
pure DataFrame compositions (JVM-side, codegen'd) except where hashing
math requires vectorized arithmetic — still built-in expressions here.

Scale notes:
* exact dedup = hash-groupBy, map-side combinable, AQE-coalesced;
* MinHash-LSH: shingles -> explode -> min per (doc, perm) via xxhash64
  with per-permutation seeds -> band keys -> self-join on band bucket —
  the quadratic step is confined to same-bucket pairs;
* SimHash: 64-bit sign-aggregated token hashes; near-dup candidates
  share one of 4 16-bit chunks (Hamming <= 3 in practice);
* n-gram Jaccard verifies candidate pairs exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col):
    """Lowercase, collapse whitespace, strip punctuation-ish chars."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-text group.
    Returns (doc_id, n_copies) for kept docs."""
    key = F.xxhash64(normalize_text(F.col(text_col))).alias("text_hash")
    return (
        df.select(F.col(id_col), key)
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_copies"),
        )
        .drop("text_hash")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Word k-shingles per document: (doc_id, shingle_hash:long)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k)))
    )
    return df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_perm: int = 32
) -> DataFrame:
    """(doc_id, sig:array<long>): minimum of seeded rehashes per permutation.

    One explode of ``num_perm`` is a constant fan-out; min() is map-side
    combinable so the shuffle carries (doc, perm, min) partials only.
    """
    perms = F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm")
    h = F.xxhash64(F.col("shingle"), F.col("perm"))
    return (
        sh.select(F.col(id_col), F.col("shingle"), perms)
        .withColumn("h", h)
        .drop("shingle")
        .groupBy(id_col, "perm")
        .agg(F.min("h").alias("mh"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("perm", "mh"))).alias("_s"))
        .select(id_col, F.col("_s.mh").alias("sig"))
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 8
) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash) buckets.
    Returns distinct candidate pairs (a < b)."""
    num_perm = bands  # rows per band inferred from sig length at runtime
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("sig"),
                                b * (F.size("sig") / bands).cast("int") + 1,
                                (F.size("sig") / bands).cast("int"),
                            ),
                            lambda v: v.cast("string"),
                        ),
                    ),
                    b,
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.select(F.col(id_col).alias("a"), "band", "bucket")
    right = banded.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard over word k-shingles for candidate pairs; keeps
    pairs with similarity >= threshold. Join-reuses the shingle table."""
    sh = shingles(df, text_col, id_col, k)
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        pairs.join(a, "a")
        .join(b, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    return (
        inter.join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("n", "nb"), "b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: sign of the per-bit sum of token
    hashes. Pure built-in expressions: explode words -> per-bit +/-1 via
    shiftright & 1 -> sum -> reassemble bits."""
    words = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
    ).where(F.col("w") != "")
    h = words.withColumn("h", F.xxhash64("w"))
    bits = h.select(
        id_col,
        F.posexplode(
            F.expr(
                "transform(sequence(0, 63), "
                "b -> CASE WHEN (h & shiftleft(1L, b)) != 0 THEN 1 ELSE -1 END)"
            )
        ).alias("bit", "sign"),
    )
    agg = bits.groupBy(id_col, "bit").agg(F.sum("sign").alias("s"))
    return agg.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def embedding_near_dup(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bucket_dims: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Scale path: LSH-style sign bucket over the first ``bucket_dims``
    dimensions (random-hyperplane equivalent for centered embeddings)
    confines the pairwise cosine to same-bucket candidates.
    """
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x))
    sig = F.aggregate(
        F.zip_with(
            F.slice(F.col(vec_col), 1, bucket_dims),
            F.sequence(F.lit(0), F.lit(bucket_dims - 1)).cast("array<double>"),
            lambda v, i: F.when(v > 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    base = emb.select(F.col(id_col), F.col(vec_col), norm.alias("nrm"), sig.alias("bucket"))
    a = base.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na"), "bucket"
    )
    b = base.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb"), "bucket"
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "bucket")
        .where(F.col("a") < F.col("b"))
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
