"""Native streaming deduplication — Spark's built-in
``dropDuplicatesWithinWatermark`` (3.5+) wired for the engine's
stream surface. The stateful-registry twin
(`streaming.stateful.stream_dedup_registry`) keeps ALL keys forever
via applyInPandasWithState; this one bounds state by the watermark —
the only viable contract on an unbounded 100 TB/day stream (a key
re-appearing after the watermark expires is emitted again, by design:
state that never expires is a scale-killer, cf. the reference's
upsert-dedup semantics which rely on a persistent external store
instead).

Determinism note: WHICH physical row survives per key depends on
arrival order, so downstream oracles should compare the KEY set (and
key-level aggregates), not incidental payload columns — the q196
pattern.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_within_watermark(
    sdf: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First event per ``key_cols`` within the watermark horizon.
    State size is O(keys per watermark window), not O(all keys ever).
    Returns the deduplicated stream (all input columns)."""
    if not key_cols:
        raise ValueError("stream_dedup_within_watermark: key_cols is empty")
    if not sdf.isStreaming:
        raise ValueError(
            "stream_dedup_within_watermark: expected a streaming DataFrame"
        )
    return sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_dedup_counts(
    sdf: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Deduplicated stream projected to its keys — the order-
    independent surface (one row per surviving key instance) that a
    stream==batch oracle can value-check."""
    dd = stream_dedup_within_watermark(sdf, key_cols, ts_col, watermark)
    return dd.select(*[F.col(c) for c in key_cols])
