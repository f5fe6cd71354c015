"""Join-key skew diagnostics — the operational companion to
`operators.joins.salted_join_auto`: BEFORE committing a 100 TB join,
profile the key distribution and get the salt factor the auto-salter
would apply, as a one-row report a pipeline can log/alert on.

All metrics are exact integers (shares in parts-per-million via
integer DIV), so the report is bit-reproducible and SQL-replayable.
Hot keys (share > threshold) are found with the same Misra-Gries
candidate sweep + exact recount as the auto-salted join — the full
per-key count table is never materialized on the driver and the only
full-table work is one map-side-combined distinct-count pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import _detect_hot_keys_with_total


def join_skew_report(
    df: DataFrame,
    on: str | Sequence[str],
    threshold_frac: float = 0.01,
    target_parallelism: int = 32,
    max_salt: int = 64,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """One-row skew report for join key ``on``:

    (n_rows, n_distinct_keys, hot_keys, hot_rows, max_key_rows,
    max_share_ppm, recommended_salt)

    - n_rows counts null-free key rows (nulls never match an equi-join)
    - hot_* cover keys with share strictly > ``threshold_frac``
    - max_key_rows/max_share_ppm: the heaviest HOT key (NULL when no
      key crosses the threshold — then the exact max is unknown by
      design; the Misra-Gries sweep only guarantees a superset above
      the threshold, which is what the salting decision needs)
    - recommended_salt = ceil(max_key_rows · P / n_rows) capped at
      ``max_salt`` — the factor splitting the heaviest key into
      roughly partition-sized slices at parallelism P; 1 when no skew.

    ``hot_keys``: a precomputed ``joins.hot_key_table`` frame over the
    same df/keys — share ONE detection scan between the report and the
    ``salted_join_auto`` calls it gates.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if hot_keys is not None:
        missing = (set(keys) | {"__cnt", "__n"}) - set(hot_keys.columns)
        if missing:
            raise ValueError(
                "join_skew_report: hot_keys is missing columns "
                f"{sorted(missing)} — pass the hot_key_table(...) output "
                "built over the SAME frame and keys"
            )
        hot = hot_keys
    else:
        hot = _detect_hot_keys_with_total(df, keys, threshold_frac)
    nn = None
    for c in keys:
        p = F.col(c).isNotNull()
        nn = p if nn is None else nn & p
    totals = df.filter(nn).groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(
            F.struct(*[F.col(c) for c in keys])
        ).alias("n_distinct_keys"),
    )
    hot_agg = hot.groupBy().agg(
        F.count(F.lit(1)).alias("hot_keys"),
        F.sum("__cnt").alias("hot_rows"),
        F.max("__cnt").alias("max_key_rows"),
    )
    rec = F.when(
        F.col("max_key_rows").isNull(), F.lit(1).cast("long")
    ).otherwise(
        F.least(
            F.lit(max_salt).cast("long"),
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"(max_key_rows * {target_parallelism} + n_rows - 1)"
                    " DIV n_rows"
                ),
            ),
        )
    )
    return (
        totals.crossJoin(F.broadcast(hot_agg))
        .select(
            "n_rows",
            "n_distinct_keys",
            F.coalesce("hot_keys", F.lit(0)).alias("hot_keys"),
            F.coalesce("hot_rows", F.lit(0)).alias("hot_rows"),
            "max_key_rows",
            F.expr("(max_key_rows * 1000000) DIV n_rows").alias(
                "max_share_ppm"
            ),
            rec.alias("recommended_salt"),
        )
    )
