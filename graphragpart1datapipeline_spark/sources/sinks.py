"""Batched side-effecting sinks — the reference's external-system
ingestion pattern (S14/S17): 1000-row Cypher ``UNWIND $batch`` calls
(ingest_graph_db.py:117-296, settings.py:114) and 128-doc Chroma
upserts (ingest_vector_db.py:181-210).

Spark shape: ``foreachPartition`` with in-partition chunking — each
executor opens ONE connection (per partition), sends fixed-size
batches, and never materializes the partition in memory. Retries and
backoff belong in the writer callable, exactly where the reference
keeps them (utils/neo4j_helpers.py:62-100). For Structured Streaming
the same writer drops into ``foreachBatch``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row


def foreach_batched(
    df: DataFrame,
    writer: Callable[[list[dict]], None],
    batch_size: int = 1000,
    open_conn: Callable[[], object] | None = None,
    close_conn: Callable[[object], None] | None = None,
) -> None:
    """Run ``writer(batch_of_row_dicts)`` over fixed-size chunks of every
    partition. ``open_conn``/``close_conn`` bracket each partition (one
    connection per task, the reference's driver-session pattern); when
    given, the writer is called as ``writer(conn, batch)``."""

    def handle(rows: Iterator[Row]) -> None:
        conn = open_conn() if open_conn else None
        try:
            batch: list[dict] = []
            for row in rows:
                batch.append(row.asDict(recursive=True))
                if len(batch) >= batch_size:
                    _emit(conn, batch)
                    batch = []
            if batch:
                _emit(conn, batch)
        finally:
            if conn is not None and close_conn:
                close_conn(conn)

    def _emit(conn: object, batch: list[dict]) -> None:
        if conn is not None:
            writer(conn, batch)  # type: ignore[call-arg]
        else:
            writer(batch)

    df.foreachPartition(handle)


def stream_foreach_batched(
    stream_df: DataFrame,
    writer: Callable[[list[dict]], None],
    batch_size: int = 1000,
    checkpoint: str | None = None,
    **start_kwargs,
):
    """Structured-Streaming twin: per micro-batch, apply the same
    batched writer via foreachBatch (exactly-once per epoch when the
    writer is idempotent on (epoch_id, batch))."""

    def for_each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        foreach_batched(batch_df, writer, batch_size)

    w = stream_df.writeStream.foreachBatch(for_each_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start(**start_kwargs)
