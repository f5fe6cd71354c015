"""Small engine utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY when the input has fewer partitions than the
    cluster can use. Small single-file tables (one parquet file → one
    scan partition) otherwise serialize CPU-heavy per-row stages
    (hashing, shingling, chunking) onto one core; the repartition
    shuffle of a small table is orders of magnitude cheaper than that.
    At scale inputs already have plenty of partitions and this is a
    no-op (no shuffle added)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
