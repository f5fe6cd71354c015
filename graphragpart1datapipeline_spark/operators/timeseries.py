"""Time-series resampling operators: gap-filled LOCF resampling and
time-range rolling aggregates — the hypertable surface (TimescaleDB's
``time_bucket_gapfill`` + ``locf``, KDB's ``fills``) expressed as
DataFrame plans.

All bucket arithmetic runs on epoch-second BIGINTs (timezone-free,
bit-identical across engines); rolling sums decimal-accumulate so the
frame's addition order cannot matter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(ts_col: str):
    return F.unix_timestamp(F.col(ts_col)).cast("long")


def resample_locf(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tiebreak_cols: Sequence[str] = (),
    max_buckets_per_group: int = 1_000_000,
) -> DataFrame:
    """Resample each group's series onto a regular ``step_seconds``
    grid spanning [first event, last event] per group, carrying the
    last observation forward into empty buckets (LOCF gap-fill).

    Returns (group_col, bucket_start epoch-seconds, value, observed):
    ``observed`` is false for gap-filled rows.

    Determinism: the per-bucket representative is the max of
    struct(ts, *tiebreak_cols, value) — with a unique tiebreak this is
    a total order, so ties on ts cannot flip the carried value.

    Plan shape: one groupBy(group, bucket) picks representatives
    (map-side combined); one groupBy(group) computes the grid bounds;
    the grid explodes from a ``sequence`` expression (row-local — the
    grid never shuffles); the fill is one window over (group, bucket).
    Groups are independent, so the plan scales with the number of
    series; a single series spanning years at 1s steps is the skew
    unit — split such series by time range first.
    """
    b = (F.floor(_epoch(ts_col) / F.lit(step_seconds)) * step_seconds).cast(
        "long"
    )
    pick = F.struct(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols], F.col(value_col)
    )
    per_bucket = (
        df.select(F.col(group_col), b.alias("bucket_start"), pick.alias("__s"))
        .groupBy(group_col, "bucket_start")
        .agg(F.max("__s").getField(value_col).alias("__obs"))
    )
    bounds = df.select(F.col(group_col), b.alias("__b")).groupBy(group_col).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    # loud skew guard: a single series spanning years at a fine step
    # would explode one row into millions — fail with a message instead
    # of silently OOMing the task (split such series by time range)
    n_buckets = (F.col("__hi") - F.col("__lo")) / F.lit(step_seconds)
    guard = F.assert_true(
        n_buckets < F.lit(max_buckets_per_group),
        F.concat(
            F.lit("resample_locf: group "),
            F.col(group_col).cast("string"),
            F.lit(f" needs > {max_buckets_per_group} buckets at step "
                  f"{step_seconds}s; split the series or raise "
                  "max_buckets_per_group"),
        ),
    )
    # fold the guard into sequence()'s lower bound (NULL + 0 on
    # success): it evaluates BEFORE the grid array is built and column
    # pruning can never optimize the assertion away
    lo_guarded = F.col("__lo") + F.coalesce(guard.cast("long"), F.lit(0))
    grid = bounds.select(
        F.col(group_col),
        F.explode(
            F.sequence(
                lo_guarded, F.col("__hi"), F.lit(step_seconds).cast("long")
            )
        ).alias("bucket_start"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(per_bucket, [group_col, "bucket_start"], "left")
    return joined.select(
        F.col(group_col),
        F.col("bucket_start"),
        F.last("__obs", ignorenulls=True).over(w).alias("value"),
        F.col("__obs").isNotNull().alias("observed"),
    )


def rolling_time_agg(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    decimal_scale: int = 6,
) -> DataFrame:
    """Per-event trailing time-range aggregate: for every row, the sum
    and count of ``value_col`` over the group's events in
    [t − window_seconds, t] — a RANGE frame on epoch seconds, NOT a row
    frame (q27's shape), so irregular event spacing is handled exactly.

    One window over (group, epoch); sums decimal-accumulate (exact,
    order-independent) and cast back to double. All original columns
    pass through with ``rolling_sum``/``rolling_n`` appended.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(_epoch(ts_col))
        .rangeBetween(-window_seconds, 0)
    )
    return df.select(
        "*",
        F.sum(F.col(value_col).cast(f"decimal(30,{decimal_scale})"))
        .over(w)
        .cast("double")
        .alias("rolling_sum"),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
    )


def ewma_weights(alpha: float, k: int) -> list[float]:
    """Truncated EWMA lag weights w_j = alpha*(1-alpha)^j, j=0..k-1,
    computed ONCE driver-side so Spark and any SQL oracle consume the
    SAME double literals (pow() portability is never relied upon)."""
    return [alpha * (1.0 - alpha) ** j for j in range(k)]


def ewma(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.5,
    k: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated exponentially-weighted moving average per group:
    ewma_i = sum_j(w_j * x_{i-j}) / sum_j(w_j present), over the last
    ``k`` observations ordered by ``order_cols``.

    Expressed as k ``lag()`` terms over ONE window (one shuffle on
    ``group_col``, no self-join, no UDF). The truncation makes the
    state finite, which is what lets the same computation run as a
    window in any engine; untruncated EWMA needs a recursive scan.
    At the series head (fewer than k rows) the weight mass renormalizes
    over the available lags, so early rows are plain weighted means of
    what exists — no NULL warm-up period.

    Determinism: weights are shared double literals; the numerator and
    denominator are built with left-associated addition in lag order on
    both engines, so each row's arithmetic is bit-identical.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: got {k}")
    if not (0 < alpha <= 1):
        raise ValueError(f"alpha must be in (0, 1]: got {alpha}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(*[F.col(c) for c in order_cols])
    )
    weights = ewma_weights(alpha, k)
    x = F.col(value_col).cast("double")
    num = None
    den = None
    for j, wj in enumerate(weights):
        lagged = F.lag(x, j).over(w)
        term = F.coalesce(lagged * F.lit(wj), F.lit(0.0))
        mass = F.when(lagged.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = mass if den is None else den + mass
    return df.withColumn(out_col, num / den)


def cumulative_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """New-vs-returning growth curve: per time bucket, how many keys
    appear for the FIRST time, plus the running total of distinct keys
    ever seen (the classic \"cumulative distinct users\" query).

    Plan: one groupBy(key) for first-seen (map-side partial min), one
    tiny groupBy(bucket), one ordered window over the bucket table
    (whose row count is bounded by the time span / bucket_seconds, so
    the single-partition window is driver-trivial regardless of input
    scale). No distinct-per-window recount — the first-seen reduction
    is what makes this O(keys) instead of O(buckets * keys).

    Returns (bucket_start, new_keys, cum_distinct_keys).
    """
    first_seen = (
        df.select(F.col(key_col).alias("k"), _epoch(ts_col).alias("e"))
        .groupBy("k")
        .agg(F.min("e").alias("first_e"))
        .select(
            (F.floor(F.col("first_e") / bucket_seconds) * bucket_seconds)
            .cast("long")
            .alias("bucket_start")
        )
    )
    per_bucket = first_seen.groupBy("bucket_start").agg(
        F.count(F.lit(1)).alias("new_keys")
    )
    w = Window.orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_bucket.withColumn(
        "cum_distinct_keys", F.sum("new_keys").over(w)
    )


def event_transitions(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """First-order transition counts (Markov edge list) over each
    group's ordered event stream: one lag() window (single shuffle on
    the group key) + one counting groupBy. Returns
    (from_state, to_state, n). The start-of-stream pseudo-state is
    emitted as NULL from_state so row counts reconcile with the input.
    """
    w = Window.partitionBy(group_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        df.withColumn("__prev", F.lag(F.col(state_col)).over(w))
        .groupBy(
            F.col("__prev").alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def debounce(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Debounce/throttle: within each group, keep only the FIRST event
    of every burst — a burst being a maximal chain of events whose
    consecutive gaps are all <= gap_seconds. (Session-window semantics:
    suppression chains through intermediate suppressed events, which a
    naive 'gap since previous row' filter gets wrong only in the other
    direction — this is island detection, exact.)

    Two windows on the SAME (group, order) partitioning — Catalyst
    plans one exchange + one sort: lag() marks burst starts, a running
    sum turns marks into burst ids, row_number picks the first row per
    burst. Deterministic under timestamp ties via ``tiebreak_cols``.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(group_col).orderBy(*order)
    e = _epoch(ts_col)
    gap = e - F.lag(e).over(w)  # NULL on the group's first row
    new_burst = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    marked = df.withColumn(
        "__burst",
        F.sum(new_burst).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wb = Window.partitionBy(group_col, "__burst").orderBy(*order)
    return (
        marked.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") == 1)
        .drop("__burst", "__rn")
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling distinct active users (DAU→WAU/MAU): for each day, how
    many distinct users were active in the trailing ``window_days``
    window — WITHOUT a distinct-per-window recount. Per-(user, day)
    dedup first (one shuffle, map-side combined), then each active day
    fans out to the ``window_days`` target days it supports (map-only
    explode), distinct (user, target day) collapses multi-active users
    (second shuffle), and a final count per day. Total exchange volume
    is window_days x user-days — linear, vs the naive per-window
    distinct that rescans the window span for every day.

    Returns (day, active_users) for every day supported by at least
    one event, day = epoch-day bucket start in seconds.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1: got {window_days}")
    ud = (
        df.select(
            F.col(user_col).alias("u"),
            F.floor(_epoch(ts_col) / 86_400).cast("long").alias("d"),
        )
        .distinct()
    )
    fan = ud.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + (window_days - 1))
        ).alias("td"),
    ).distinct()
    return (
        fan.groupBy((F.col("td") * 86_400).alias("day"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
