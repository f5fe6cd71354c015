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

REGISTRY_SCHEMA = "content_key string, keep_id bigint, n_seen bigint"
_REGISTRY_STATE = "keep_id bigint, n bigint"


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


def stream_dedup_registry(
    sdf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact-dedup registry: per normalized-content hash,
    maintain the winning (smallest) document id in the state store and
    emit the registry row whenever it changes. The incremental form of
    ``dedup.exact_dedup`` for continuous ingest: downstream joins the
    registry to keep only ``keep_id`` rows, so a duplicate arriving
    hours later still loses to the first-kept document.

    Batch twin (unit-tested equal after an availableNow run):
    ``groupBy(content_key).agg(min(id), count(*))``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..text.analysis import document_fingerprint

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        keep, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            n += len(pdf)
            batch_min = int(pdf["__id"].min())
            keep = batch_min if keep is None else min(keep, batch_min)
        state.update((int(keep), int(n)))
        yield pd.DataFrame(
            {"content_key": [key[0]], "keep_id": [keep], "n_seen": [n]}
        )

    keyed = sdf.select(
        document_fingerprint(text_col, 32).alias("__k"),
        F.col(id_col).cast("long").alias("__id"),
    )
    return keyed.groupBy("__k").applyInPandasWithState(
        fn,
        outputStructType=REGISTRY_SCHEMA,
        stateStructType=_REGISTRY_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_SCHEMA = "key string, n_events bigint, ewma double"
_EWMA_STATE = (
    "n bigint, es array<bigint>, ids array<bigint>, vs array<double>"
)


def stream_ewma_by_key(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    alpha: float = 0.5,
    k: int = 8,
) -> DataFrame:
    """Streaming truncated EWMA per key: each micro-batch emits the
    smoothed value AT THE LATEST EVENT for every key it touched.

    Out-of-order-safe BY CONSTRUCTION: the truncated EWMA depends only
    on the k latest observations, so the state is exactly that top-k
    set ordered by (ts, tiebreak) — merging any batch split (late
    arrivals included) into a top-k set is order-independent, so the
    final emission hash-equals the batch :func:`...timeseries.ewma`
    at each key's last row (the q139 oracle) no matter how the feed is
    batched. State is O(k) per key; no sort of the stream, ever.

    The combination runs the SAME left-associated double arithmetic as
    the batch operator's lag-chain (CPython floats are IEEE doubles),
    so equality is bit-level, not tolerance-level.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.timeseries import ewma_weights

    weights = ewma_weights(alpha, k)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, es, ids, vs = state.get
            # nulls round-trip the state store as NaN
            obs = [
                (int(e), int(i), None if v != v else float(v))
                for e, i, v in zip(es, ids, vs)
            ]
            n = int(n)
        else:
            n, obs = 0, []
        for pdf in pdfs:
            n += len(pdf)
            for e, i, v in zip(pdf["__e"], pdf["__id"], pdf["__v"]):
                obs.append(
                    (int(e), int(i), None if pd.isna(v) else float(v))
                )
        obs.sort(key=lambda t: (t[0], t[1]), reverse=True)
        obs = obs[:k]
        num = 0.0
        den = 0.0
        for j, (_, _, v) in enumerate(obs):
            # identical shape to the batch lag-chain: coalesce(v*w, 0)
            # summed left-associated in lag order, mass only when present
            if v is not None:
                num = num + v * weights[j]
                den = den + weights[j]
            else:
                num = num + 0.0
                den = den + 0.0
        state.update(
            (
                n,
                [t[0] for t in obs],
                [t[1] for t in obs],
                [float("nan") if t[2] is None else t[2] for t in obs],
            )
        )
        # den == 0 (all-null window) mirrors the batch 0.0/0.0 -> NaN
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "ewma": [num / den if den else float("nan")],
            }
        )

    keyed = sdf.select(
        F.col(key_col).cast("string").alias("__k"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("__e"),
        F.col(tiebreak_col).cast("long").alias("__id"),
        F.col(value_col).cast("double").alias("__v"),
    )
    return keyed.groupBy("__k").applyInPandasWithState(
        fn,
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
