"""Reshaping operators: pivot (long→wide), unpivot/melt (wide→long),
CUBE aggregation, and a single-pass 2-D skyline.

Reference scope: the reference pipeline reshapes release tables between
long and wide forms in Polars (`pivot`/`melt`); here the same surface is
expressed as Catalyst-native plans:

- :func:`pivot_agg` REQUIRES the pivot values up front. Spark's
  two-argument ``pivot(col)`` runs a hidden ``collect distinct`` pass
  over the fact table to discover them — a full extra scan at 100 TB.
  With explicit values the plan is one shuffle (partial aggs map-side,
  one exchange on the group keys), identical to conditional aggregation.
- :func:`unpivot_long` is ``DataFrame.unpivot`` (a map-only Expand node,
  no shuffle): k value columns → k rows per input row.
- :func:`cube_agg` uses the native CUBE Expand (2^k grouping sets in one
  shuffle, partial-agg friendly) plus per-column ``grouping()`` flags —
  engine-portable, unlike the bit-packed ``grouping_id()``.
- :func:`skyline2d` computes the Pareto frontier of (minimize x,
  maximize y) with ONE sort + ONE running-max window instead of the
  quadratic NOT-EXISTS dominance join: after sorting by (x asc, y desc),
  a row is on the frontier iff its y strictly exceeds every y seen at a
  strictly smaller x.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pivot_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    value_col: str,
    agg: str = "sum",
    decimal_scale: int = 4,
) -> DataFrame:
    """Long→wide: one output column per ``pivot_values`` entry.

    ``pivot_values`` is mandatory by design (see module docstring —
    Spark would otherwise prepend a distinct-collect scan). ``sum`` and
    ``avg`` accumulate through DECIMAL(25,scale) so the result is
    order-independent and engine-portable; ``count`` stays integral.
    Unseen combinations yield 0 for count and NULL otherwise, matching
    conditional-aggregation SQL.
    """
    gb = df.groupBy(*[F.col(c) for c in group_cols]).pivot(
        pivot_col, list(pivot_values)
    )
    if agg == "sum":
        out = gb.agg(
            F.sum(F.col(value_col).cast(f"decimal(25,{decimal_scale})"))
            .cast("double")
            .alias("v")
        )
    elif agg == "count":
        out = gb.agg(F.count(F.lit(1)).alias("v"))
    elif agg == "avg":
        # Denominator counts only non-null measures so the result
        # matches SQL AVG (null-ignoring on both sides of the division).
        out = gb.agg(
            (
                F.sum(F.col(value_col).cast(f"decimal(25,{decimal_scale})")).cast(
                    "double"
                )
                / F.count(F.col(value_col))
            ).alias("v")
        )
    else:
        raise ValueError(f"unsupported agg: {agg}")
    if agg == "count":
        out = out.select(
            *group_cols, *[F.coalesce(F.col(v), F.lit(0)).alias(v) for v in pivot_values]
        )
    return out


def unpivot_long(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long melt via the native Expand node (map-only, no shuffle).
    All ``value_cols`` are cast to double so heterogeneous numeric
    columns share one value column."""
    casted = df.select(
        *[F.col(c) for c in id_cols],
        *[F.col(c).cast("double").alias(c) for c in value_cols],
    )
    return casted.unpivot(
        list(id_cols), list(value_cols), var_name, value_name
    )


def cube_agg(
    df: DataFrame,
    cube_cols: Sequence[str],
    value_col: str,
    decimal_scale: int = 4,
) -> DataFrame:
    """CUBE over ``cube_cols``: all 2^k grouping sets in ONE shuffle
    (the Expand replicates rows map-side; partial aggregation still
    applies). Emits per-column ``grouping()`` flags (0 = grouped,
    1 = rolled up) — portable across engines, unlike bit-packed
    grouping_id()."""
    aggs = [
        F.sum(F.col(value_col).cast(f"decimal(25,{decimal_scale})"))
        .cast("double")
        .alias(f"sum_{value_col}"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    flags = [F.grouping(c).cast("int").alias(f"g_{c}") for c in cube_cols]
    return (
        df.cube(*[F.col(c) for c in cube_cols])
        .agg(*(flags + aggs))
        .select(
            *cube_cols,
            *[f"g_{c}" for c in cube_cols],
            f"sum_{value_col}",
            "n_rows",
        )
    )


def skyline2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Pareto frontier of (minimize ``min_col``, maximize ``max_col``).

    Dominance: row r is OFF the frontier iff some row s has
    s.min_col <= r.min_col AND s.max_col >= r.max_col with at least one
    strict. Single sort formulation: order by (min_col asc, max_col
    desc); r survives iff max_col(r) > running max of max_col over rows
    with STRICTLY smaller min_col AND r is the max-``max_col``
    representative of its exact (min_col, max_col) duplicate class
    handled by distinct-ing the value pair first.

    One exchange (the sort) + one window — vs the quadratic dominance
    self-join. Ties on the value pair keep every distinct tiebreak row
    (standard skyline semantics: equal points are mutually
    non-dominating).
    """
    # Two-step running max over strictly-smaller min_col (a RANGE frame
    # offset of -1 is wrong for fractional gaps): per distinct min_col
    # compute the band max, then running max shifted by one band.
    bands = (
        df.groupBy(min_col)
        .agg(F.max(F.col(max_col)).alias("_band_max"))
    )
    wb = Window.orderBy(min_col)
    bands = bands.withColumn(
        "_prev_best",
        F.max("_band_max").over(
            wb.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).select(min_col, "_prev_best")
    out = (
        df.join(bands, min_col, "left")
        .filter(
            F.col("_prev_best").isNull()
            | (F.col(max_col) > F.col("_prev_best"))
        )
        .drop("_prev_best")
    )
    # Within one min_col band only the band max survives (smaller y at
    # equal x is dominated).
    band_w = Window.partitionBy(min_col)
    out = (
        out.withColumn("_bm", F.max(F.col(max_col)).over(band_w))
        .filter(F.col(max_col) == F.col("_bm"))
        .drop("_bm")
    )
    return out
