"""Embedding-cosine near-duplicate detection.

Exact cosine between embedding vectors for candidate pairs. The scale
path reuses the vector LSH bucketer (random-hyperplane signs) to avoid
the O(n²) pair space; the exact variant here is the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..vector.search import cosine_expr


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bucket_bits: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. With bucket_bits > 0, candidates
    are restricted to equal random-hyperplane sign-buckets (approximate,
    misses some pairs near hyperplanes; that's the documented trade).
    Returns (a, b, cosine)."""
    base = df.select(F.col(id_col), F.col(vec_col).alias("__v"))
    if bucket_bits > 0:
        from ..vector.search import hyperplane_bucket

        base = base.withColumn(
            "__bkt", hyperplane_bucket(F.col("__v"), bucket_bits, seed)
        )
        join_keys = ["__bkt"]
        a = base.select(
            *join_keys, F.col(id_col).alias("a"), F.col("__v").alias("va")
        )
        b = base.select(
            *join_keys, F.col(id_col).alias("b"), F.col("__v").alias("vb")
        )
        pairs = a.join(b, join_keys)
    else:
        a = base.select(F.col(id_col).alias("a"), F.col("__v").alias("va"))
        b = base.select(F.col(id_col).alias("b"), F.col("__v").alias("vb"))
        pairs = a.crossJoin(b)
    return (
        pairs.filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
