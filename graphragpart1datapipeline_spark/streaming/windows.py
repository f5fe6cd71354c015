"""Event-time windowing — batch AND Structured Streaming forms.

The reference has no true streaming (SURVEY §2.11): it micro-batches
with slice iterators (ingest_vector_db.py:76-93). The engine exposes the
real thing: tumbling/sliding/session windows usable identically on a
static events table (duckdb-verifiable) and on a stream (withWatermark
for late data).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation. On a streaming df pass a
    ``watermark`` (e.g. "10 minutes") to bound state and admit late data
    up to the bound. Output keys: window_start, window_end + group cols."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) event-time windows."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_windows(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when
    the gap to the previous event of the same user exceeds the
    threshold; session_id = cumulative count of session starts. Exactly
    the lag+cumsum plan every SQL engine can oracle. For the streaming
    form use ``F.session_window(ts, gap)`` (state-backed equivalent)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id") if "event_id" in df.columns else Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
            > gap_minutes * 60
        )
    ).cast("long")
    return df.withColumn("__new", is_new).withColumn(
        "session_id",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("__new")


def stream_tumbling_counts(
    stream_df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Structured-Streaming tumbling counts with a watermark — the
    canonical readStream → window → writeStream middle stage."""
    return tumbling_window_agg(
        stream_df,
        ts_col,
        duration,
        group_cols,
        [F.count(F.lit(1)).alias("n_events")],
        watermark=watermark,
    )


def stream_interval_join(
    left,
    right,
    on,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: int = -3600,
    upper: int = 0,
    watermark: str = "1 hour",
):
    """Stream-stream inner join with a time-range condition: pairs where
    ``right_ts - left_ts ∈ [lower, upper]`` seconds for the same key —
    the streaming twin of ``operators.range_join`` (same semantics the
    batch DuckDB oracle checks on q61).

    Both inputs are watermarked and the join condition bounds the two
    event times relative to each other, which is exactly what Spark
    needs to derive state eviction: each side's join state is dropped
    once the other side's watermark passes the reachable time range, so
    state stays O(window span × arrival rate) instead of growing
    unboundedly. Right columns come back prefixed ``r_``.
    """
    from pyspark.sql import functions as F

    keys = [on] if isinstance(on, str) else list(on)
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = (
        right.withWatermark(right_ts, watermark)
        .select(
            *[F.col(k).alias(f"__rk_{k}") for k in keys],
            *[
                F.col(c).alias(f"r_{c}")
                for c in right.columns
                if c not in keys
            ],
        )
        .alias("r")
    )
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.__rk_{k}")
        cond = c if cond is None else cond & c
    rts, lts = F.col(f"r.r_{right_ts}"), F.col(f"l.{left_ts}")
    cond = (
        cond
        & (rts >= lts + F.expr(f"INTERVAL {lower} SECONDS"))
        & (rts <= lts + F.expr(f"INTERVAL {upper} SECONDS"))
    )
    return l.join(r, cond, "inner").drop(*[f"__rk_{k}" for k in keys])
