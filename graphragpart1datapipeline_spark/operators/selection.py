"""EXACT distributed quantile selection over BIGINT columns — the
missing rung between the engine's one-pass APPROXIMATE quantiles
(bottom-k / GK sketches, q51/q86) and a full global sort nobody runs
at 100 TB: radix bisection. The k-th smallest element of N values is
pinned in ceil(64/16) = 4 bounded-histogram passes — each pass groups
the surviving values by the next 16-bit digit (a 65536-row histogram,
map-side combined, driver-merged), picks the digit bucket containing
rank k, and descends. No global sort, no window, no single-machine
materialization; the scanned column is localCheckpoint'd once and
re-read 4 times.

This is the textbook distributed-selection answer to the problem the
CCNet bucketing docstring names ("a corpus-wide exact tercile is a
distributed selection problem" — text/lm.py): where q239/q264
calibrate on a bounded sample exactly like CCNet, this operator
computes the TRUE corpus-wide nearest-rank quantile when exactness is
worth 4 scans (SLA percentiles, auditable curation thresholds).

Sign handling: the TOP 16-bit digit biases the arithmetic shift
(``(v >> 48) + 32768`` ∈ [0, 65535], monotone over the full signed
range — negative values land below positive ones); lower digits are
plain masked shifts, monotone once the higher digits are fixed. All
digit arithmetic is exact integer column work.

The nearest-rank definition (k = ceil(q·N)) matches DuckDB's
``quantile_disc`` / the SQL ``row_number() = k`` replay, so results
carry a full value oracle (q267).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_kth_long", "exact_quantiles_long"]

_SHIFTS = (48, 32, 16, 0)


def _digit(shift: int):
    v = F.col("v")
    if shift == 48:
        return (F.shiftright(v, 48) + F.lit(32768)).cast("long")
    return (F.shiftright(v, shift).bitwiseAND(F.lit(0xFFFF))).cast("long")


def exact_kth_long(src: DataFrame, k: int) -> int:
    """The k-th smallest (1-based, nearest-rank) value of ``src``'s
    single BIGINT column ``v`` — 4 histogram passes, each a ≤65536-row
    driver merge. Raises when k is out of range (fewer than k rows
    survive — silently returning a boundary value would corrupt any
    threshold derived from it)."""
    if k < 1:
        raise ValueError(f"exact_kth_long: k must be >= 1, got {k}")
    cond = F.lit(True)
    digits: list[int] = []
    remaining = k
    for shift in _SHIFTS:
        d = _digit(shift)
        hist = (
            src.filter(cond)
            .groupBy(d.alias("d"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("d")
            .collect()
        )
        running = 0
        chosen = None
        for row in hist:
            if running + row["c"] >= remaining:
                chosen = int(row["d"])
                remaining -= running
                break
            running += row["c"]
        if chosen is None:
            raise ValueError(
                f"exact_kth_long: rank {k} exceeds the row count "
                f"(ran dry at shift {shift})"
            )
        digits.append(chosen)
        cond = cond & (d == chosen)
    val = (
        ((digits[0] - 32768) << 48)
        | (digits[1] << 32)
        | (digits[2] << 16)
        | digits[3]
    )
    return val


def exact_quantiles_long(
    df: DataFrame,
    col: str,
    fracs: list[tuple[int, int]],
) -> list[tuple[int, int, int]]:
    """Exact nearest-rank quantiles of a BIGINT column: for each
    (num, den) fraction returns (k, value, n) with k = ceil(num·n/den)
    — the tercile/median cutoffs as TRUE corpus-wide values. The
    column projection is localCheckpoint'd once; each quantile costs
    4 histogram passes over it. Fractions must lie in (0, 1]."""
    for num, den in fracs:
        if not (0 < num <= den):
            raise ValueError(
                f"exact_quantiles_long: fraction must be in (0, 1], "
                f"got {num}/{den}"
            )
    src = df.select(F.col(col).cast("long").alias("v")).localCheckpoint(
        eager=True
    )
    n = src.count()
    if n == 0:
        raise ValueError("exact_quantiles_long: empty input")
    out = []
    for num, den in fracs:
        k = (num * n + den - 1) // den
        out.append((k, exact_kth_long(src, k), n))
    return out
