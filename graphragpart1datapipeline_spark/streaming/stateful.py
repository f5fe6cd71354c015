"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no true streaming (SURVEY §2.11); this is the engine's
scale-path answer to its slice-based micro-batching
(ingest_vector_db.py:76-93): arbitrary per-key state maintained by the
Structured Streaming state store, with watermark-driven timeouts. The
canonical use here is a running per-key aggregate — the building block
for incremental dedup registries (seen-content-hash state), rate
accounting, or incremental session rollups at 100 TB/day ingest.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RUNNING_SCHEMA = "key string, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def running_totals_by_key(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming running (count, sum) per key. Each micro-batch emits the
    updated totals for every key it touched; state persists in the state
    store across batches (update output mode).

    Batch twin for correctness: ``df.groupBy(key).agg(count, sum)`` —
    the final emitted row per key equals the batch aggregate (unit-
    tested with an availableNow run).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["__v"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [total]}
        )

    keyed = sdf.select(
        F.col(key_col).cast("string").alias("__k"),
        F.col(value_col).cast("double").alias("__v"),
    )
    return keyed.groupBy("__k").applyInPandasWithState(
        fn,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
