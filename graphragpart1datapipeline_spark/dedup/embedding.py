"""Embedding-cosine near-duplicate detection.

Exact cosine between embedding vectors for candidate pairs. The scale
path reuses the vector LSH bucketer (random-hyperplane signs) to avoid
the O(n²) pair space; the exact variant here is the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..vector.search import dot_expr, l2_norm_expr


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bucket_bits: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. Returns (a, b, cosine).

    The DEFAULT is the scale path: bucket_bits > 0 restricts candidates
    to equal random-hyperplane sign-buckets (approximate, misses some
    pairs near hyperplanes; that's the documented trade), shrinking the
    pair space ~2^bits. ``dim`` must match the embedding dimensionality
    (the planes are plan literals). Pass ``bucket_bits=0`` explicitly
    for the exact all-pairs crossJoin — a correctness oracle, never the
    default: at 100 TB the O(n²) pair space is a scale-killer.

    Scale design: each vector is L2-normalized ONCE on its own row
    (cosine = dot of unit vectors), so the O(n²/buckets) pair stage does
    a single fused dot per pair instead of dot + two norms — 3× less
    arithmetic where it multiplies. Zero-norm vectors get a null unit
    vector and can never reach a positive threshold (same outcome as
    defining their cosine as 0)."""
    base = df.select(F.col(id_col), F.col(vec_col).alias("__v"))
    if bucket_bits > 0:
        from ..vector.search import hyperplane_bucket

        # Bucket the RAW vector: sign-buckets are invariant to positive
        # scaling, so raw and unit vectors land identically (zero-norm
        # rows get a real bucket but a null unit vector below — they can
        # never reach a positive threshold either way). Bucketing before
        # normalization keeps the UDF argument a plain column, so the
        # join-key null filter Catalyst inserts reuses ONE ArrowEvalPython
        # instead of duplicating the normalize+bucket chain per side.
        base = base.withColumn(
            "__bkt", hyperplane_bucket(F.col("__v"), bucket_bits, seed, dim)
        ).filter(F.col("__bkt").isNotNull())
    base = base.withColumn("__n", l2_norm_expr(F.col("__v"))).select(
        id_col,
        *(["__bkt"] if bucket_bits > 0 else []),
        F.when(
            F.col("__n") > 0,
            F.transform(F.col("__v"), lambda x: x.cast("double") / F.col("__n")),
        ).alias("__u"),
    )
    if bucket_bits > 0:
        a = base.select(
            "__bkt", F.col(id_col).alias("a"), F.col("__u").alias("ua")
        )
        b = base.select(
            "__bkt", F.col(id_col).alias("b"), F.col("__u").alias("ub")
        )
        pairs = a.join(b, "__bkt")
    else:
        a = base.select(F.col(id_col).alias("a"), F.col("__u").alias("ua"))
        b = base.select(F.col(id_col).alias("b"), F.col("__u").alias("ub"))
        pairs = a.crossJoin(b)
    return (
        pairs.filter(F.col("a") < F.col("b"))
        .withColumn("cosine", dot_expr(F.col("ua"), F.col("ub")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
