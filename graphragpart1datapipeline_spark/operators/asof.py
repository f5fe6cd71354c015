"""As-of (time-travel) join — a custom operator Spark lacks natively.

Not in the reference (SURVEY §2.3 notes its absence) but a core
time-series/training-data primitive: for each left row, attach the
LATEST right row with ``right_ts <= left_ts`` for the same key
(backward direction; e.g. "the signup in effect at purchase time",
"the model version live when the example was logged").

Spark-first formulation — NO range join, NO per-key loop:
union-tag both sides, one window sorted by (key, ts, side, payload),
``last(payload, ignorenulls)`` over an unbounded-preceding frame. One
shuffle on the key; the window is a single pass. Right rows sort
before left rows at equal timestamps (inclusive match), and the
payload struct is its own deterministic tiebreak among simultaneous
right rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_select: Sequence[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, the latest right row with right_ts <= left_ts
    per key (``direction="backward"``), or the earliest right row with
    right_ts >= left_ts (``direction="forward"``). Right columns come
    back prefixed ``asof_`` (plus ``asof_ts``); unmatched left rows keep
    nulls. Both bounds are inclusive: a right row at exactly left_ts
    matches in either direction."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    backward = direction == "backward"
    keys = [on] if isinstance(on, str) else list(on)
    rsel = list(right_select or [c for c in right.columns if c not in keys])
    payload = F.struct(
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c).alias(f"asof_{c}") for c in rsel],
    )
    # at equal ts the right row must fall inside the left row's frame:
    # backward looks at preceding rows, so right sorts first; forward
    # looks at following rows, so right sorts last
    r_side, l_side = (0, 1) if backward else (1, 0)
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        payload.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns if c not in keys],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in keys],
    )
    order = F.col("__p") if backward else F.col("__p").desc_nulls_last()
    w = Window.partitionBy(*keys).orderBy(F.col("__ts"), F.col("__side"), order)
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("__p", ignorenulls=True)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("__p", ignorenulls=True)
    matched = r.unionByName(l).withColumn("__match", pick.over(w))
    out_left = [
        F.col(f"__l_{c}").alias(c) for c in left.columns if c not in keys
    ]
    return matched.filter(F.col("__side") == l_side).select(
        *keys,
        *out_left,
        F.col("__match.asof_ts").alias("asof_ts"),
        *[F.col(f"__match.asof_{c}").alias(f"asof_{c}") for c in rsel],
    )
