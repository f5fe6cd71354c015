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


def swap_directory(spark, path: str, tmp: str, label: str) -> None:
    """Atomically swap a freshly-written ``tmp`` directory over
    ``path`` with two renames (``path`` → ``{path}__old`` → deleted
    only after ``tmp`` is live at ``path``) — the crash-safety
    contract shared by every full-rewrite maintenance verb
    (ivf_compact, pq_delete): a durable on-disk copy of the artifact
    exists at EVERY instant, and the rename window is recoverable by
    inspection (if ``path`` is missing, ``{path}__old`` or ``tmp``
    holds the complete artifact — rename it back). Renames are atomic
    on HDFS/local FS; on S3 use a rename-capable layer for
    maintenance jobs. ``label`` names the calling verb in errors."""
    old = path + "__old"
    jvm = spark._jvm
    p_idx = jvm.org.apache.hadoop.fs.Path(path)
    fs = p_idx.getFileSystem(spark._jsc.hadoopConfiguration())
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    p_old = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(p_old):
        raise FileExistsError(
            f"{label}: {old} already exists — a previous operation "
            f"crashed mid-swap; recover (rename it back over {path} if "
            "it is missing, else delete it) before retrying"
        )
    if not fs.rename(p_idx, p_old):
        raise OSError(f"{label}: rename {path} -> {old} failed")
    if not fs.rename(p_tmp, p_idx):
        # put the original back so the artifact path stays valid
        fs.rename(p_old, p_idx)
        raise OSError(f"{label}: rename {tmp} -> {path} failed")
    fs.delete(p_old, True)
