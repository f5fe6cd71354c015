"""Streaming CDC: keep a parquet mirror table current from a change
stream with a foreachBatch upsert loop (St1 micro-batch surface; the
streaming face of ``operators.relational.cdc_upsert_state``).

State is versioned — each micro-batch writes ``state_dir/v{N+1}`` from
``v{N}`` rather than overwriting in place (a reader never observes a
half-written table, and a crashed batch leaves the previous version
intact; Delta's transaction log solves the same problem — this is the
plain-parquet equivalent). The merge itself is out-of-order-safe
(per-key last-applied seq + delete tombstones), so replayed or late
micro-batches converge to the same table as one global pass.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import cdc_upsert_state

_VERSION_RE = re.compile(r"^v(\d+)$")


def _latest_version(state_dir: str, spark: SparkSession | None = None) -> int:
    """Newest committed version under ``state_dir``. With a session,
    the listing goes through the Hadoop FileSystem API — so state on
    HDFS/S3 resolves exactly like local disk (an ``os.listdir`` probe
    only sees the driver's filesystem, the ivf_tuned_nprobe bug class);
    without one it falls back to the local listing."""
    if spark is not None:
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(state_dir)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(path):
            return -1
        versions = [
            int(m.group(1))
            for st in fs.listStatus(path)
            if (m := _VERSION_RE.match(st.getPath().getName()))
        ]
        return max(versions, default=-1)
    if not os.path.isdir(state_dir):
        return -1
    versions = [
        int(m.group(1))
        for d in os.listdir(state_dir)
        if (m := _VERSION_RE.match(d))
    ]
    return max(versions, default=-1)


def init_cdc_state(base: DataFrame, state_dir: str) -> None:
    """Seed version 0 of the state from a base snapshot (adds the
    last-applied-seq and tombstone bookkeeping columns)."""
    seeded = base.withColumn("__cdc_seq", F.lit(None).cast("long")).withColumn(
        "__cdc_deleted", F.lit(False)
    )
    seeded.write.mode("overwrite").parquet(os.path.join(state_dir, "v0"))


def read_cdc_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The newest committed state version."""
    v = _latest_version(state_dir, spark)
    if v < 0:
        raise FileNotFoundError(f"no CDC state under {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, f"v{v}"))


def prune_state_versions(
    spark: SparkSession, state_dir: str, keep: int = 2
) -> list[int]:
    """Garbage-collect old state versions, keeping the newest ``keep``
    (≥ 1 — the current version is never deletable). Without pruning, a
    long-running foreachBatch loop accumulates one full state copy per
    micro-batch — at 100 TB that is the storage bill, not a detail.
    ``keep ≥ 2`` preserves the crash contract (the previous version
    survives until the next batch commits on top of the current one).
    Deletion goes through the Hadoop FileSystem API (HDFS/S3-correct).
    Returns the deleted version numbers."""
    if keep < 1:
        raise ValueError(f"prune_state_versions: keep must be >= 1, got {keep}")
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    versions = sorted(
        int(m.group(1))
        for st in fs.listStatus(path)
        if (m := _VERSION_RE.match(st.getPath().getName()))
    )
    doomed = versions[:-keep] if len(versions) > keep else []
    for v in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(state_dir, f"v{v}"), True)
    return doomed


def stream_cdc_apply(
    changes: DataFrame,
    state_dir: str,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Run the change stream into the versioned state with foreachBatch.
    ``changes`` is a streaming DataFrame carrying full-row images plus
    (seq_col, op_col). Call :func:`init_cdc_state` first. Returns the
    StreamingQuery (``available_now=True`` drains the backlog and
    stops — the incremental-batch operating mode)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        v = _latest_version(state_dir, spark)
        state = spark.read.parquet(os.path.join(state_dir, f"v{v}"))
        merged = cdc_upsert_state(
            state, batch_df, keys, seq_col, op_col=op_col
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{v + 1}")
        )

    writer = changes.writeStream.foreachBatch(apply_batch).outputMode(
        "update"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
