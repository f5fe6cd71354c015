"""Data-layout operators: multi-dimensional (Z-order) clustering and
the file-level min/max statistics that make 100 TB scans skippable.

Why this exists: at cluster scale the dominant cost of a selective
query is the scan, and the scan cost is set by LAYOUT — how rows were
clustered into files when written. Sorting by one column serves one
predicate; interleaving the bits of several columns (the Z-order /
Morton curve, as popularized by Delta OPTIMIZE ZORDER BY) keeps rows
close in EVERY interleaved dimension, so per-file min/max footer stats
prune files for predicates on any of them.

Everything here is exact integer bit arithmetic — map-only, zero
shuffle for the z-value itself, codegen-friendly, and bit-identical in
any engine (the DuckDB oracle replays the interleave verbatim).

The write path at scale is::

    df.withColumn("z", zorder_value(cols))
      .repartitionByRange(n_files, "z")    # one range shuffle
      .sortWithinPartitions("z")
      .write.parquet(...)

Range partitioning balances rows per file; parquet footers then carry
the min/max stats this module's ``zorder_bucket_stats`` models. The
query/oracle path uses fixed-width z-prefix buckets (``z >> shift``)
instead of range buckets so bucket ids are a pure per-row function —
deterministic without a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton/Z-order interleave of ``len(cols)`` non-negative integer
    columns, ``bits`` bits each (values clamped into [0, 2^bits)).
    Bit j of column i lands at output bit j·n_cols + i."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_value needs >= 2 columns")
    if bits * n > 62:
        raise ValueError("bits * n_cols must fit in a signed 64-bit int")
    cap = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        clamped = F.least(F.greatest(col, F.lit(0)), F.lit(cap))
        for j in range(bits):
            bit = F.shiftright(clamped, j).bitwiseAND(F.lit(1))
            z = z + (bit * F.lit(1 << (j * n + i)))
    return z


def zorder_bucket_stats(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    bucket_bits: int = 6,
    normalize: bool = True,
) -> DataFrame:
    """Model the file layout a Z-ordered write produces: assign each row
    to one of ≤ 2^bucket_bits z-prefix buckets (a per-row expression —
    no global sort) and emit per-bucket footer stats: row count plus
    min/max of every clustered column. One map-side-combined groupBy.

    ``normalize=True`` (default) first rescales every column into
    [0, 2^bits) by its min/max — one tiny agg broadcast as a single-row
    frame — so the interleave uses ALL ``bits`` regardless of the
    columns' value ranges (raw interleave of small-range columns leaves
    the high bits zero and collapses every row into bucket 0; Delta's
    OPTIMIZE ZORDER normalizes by range partition for the same reason).

    The min/max spans demonstrate skippability: a range predicate on ANY
    clustered column overlaps only the buckets whose span intersects it,
    while a single-column sort gives tight spans on one column and
    full-range spans on the rest.
    """
    cap = (1 << bits) - 1
    if normalize:
        aggs = []
        for c in cols:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
        df = df.crossJoin(F.broadcast(df.agg(*aggs)))
        zcols = [
            F.floor(
                ((F.col(c) - F.col(f"__min_{c}")).cast("long") * F.lit(cap))
                / F.greatest(
                    (F.col(f"__max_{c}") - F.col(f"__min_{c}")).cast("long"),
                    F.lit(1),
                )
            ).cast("long")
            for c in cols
        ]
    else:
        zcols = [F.col(c) for c in cols]
    z = zorder_value(zcols, bits=bits)
    shift = bits * len(cols) - bucket_bits
    bucket = F.shiftright(z, max(shift, 0)).alias("bucket")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(bucket).agg(*aggs)


def skipped_bucket_fraction(
    stats: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Given ``zorder_bucket_stats`` output, compute how many buckets a
    range predicate lo <= col <= hi would scan vs skip — the data-
    skipping effectiveness readout (single-row result)."""
    overlaps = (F.col(f"max_{col}") >= F.lit(lo)) & (
        F.col(f"min_{col}") <= F.lit(hi)
    )
    return stats.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(overlaps.cast("long")).alias("scanned"),
        (F.count(F.lit(1)) - F.sum(overlaps.cast("long"))).alias("skipped"),
    )


def compaction_plan(
    files: DataFrame,
    size_col: str = "bytes",
    file_col: str = "path",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction planner — the table-maintenance companion
    to Z-ordering: assign source files to output groups so each group's
    total size ≈ ``target_bytes`` (greedy sequential fill in file order,
    group = floor(bytes_before / target)). Returns (file_col, size_col,
    group) ready to drive a per-group rewrite.

    Deterministic: the running total is a window cumsum in
    (file_col)-order — a pure function of the file listing, identical
    in any engine. The global window runs single-partition, which is
    correct AT SCALE because the input is file METADATA (one row per
    file: ~1e-6 of the data volume; 100 TB at 128 MB/file is ~800k
    rows — one task handles it). The data movement this plans is the
    expensive part, and it parallelizes per group.
    """
    from pyspark.sql import Window

    w = (
        Window.orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.select(
        file_col,
        size_col,
        F.floor(before / F.lit(target_bytes)).cast("long").alias("group"),
    )
