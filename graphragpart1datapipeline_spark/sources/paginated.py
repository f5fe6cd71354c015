"""Paginated source fan-out — the reference's SPARQL LIMIT/OFFSET
pattern (S5, utils/wikidata_helpers.py:31-118: concurrent page fetches
until a partial page) as a distributed Spark stage.

Spark-first shape: ``spark.range(n_pages)`` → one task per page →
Arrow-batched ``mapInPandas`` running the injected page fetcher. The
driver never sees row data; parallelism is the page-task count (capped
by ``repartition`` — the analogue of the reference's semaphore,
network_helpers.py:101-126). The stop-at-partial-page behavior of the
reference becomes an over-provisioned page range: empty pages yield
zero rows and cost one fetch — at scale you bound n_pages from a count
query first.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def paginated_source(
    spark: SparkSession,
    fetch_page: Callable[[int], pd.DataFrame],
    n_pages: int,
    schema: StructType | str,
    fetch_parallelism: int | None = None,
) -> DataFrame:
    """Distributed paginated pull: ``fetch_page(page_index)`` returns a
    pandas frame matching ``schema`` (empty frame = page past the end).
    Retries/backoff belong inside the fetcher, exactly where the
    reference keeps them (network_helpers.py:24-98)."""
    pages = spark.range(n_pages)
    if fetch_parallelism is not None:
        pages = pages.repartition(fetch_parallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["id"]:
                out = fetch_page(int(p))
                if len(out):
                    yield out

    return pages.mapInPandas(gen, schema=schema)
