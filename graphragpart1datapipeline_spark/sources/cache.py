"""Cache-table fetch pattern: the engine's replacement for the
reference's per-key file caches around every external API
(wikidata_helpers.py:229-245, lastfm_helpers.py:73-79, …).

Pattern (SURVEY J10): keys ⟕ cache → anti-join gives misses → fetch
ONLY misses via an Arrow-batched ``mapInPandas`` stage (rate limiting =
bounded fetch-stage parallelism via repartition) → union with hits →
optionally persist the refreshed cache.

The fetcher is any ``list[key] -> pandas.DataFrame`` callable — HTTP,
model inference, whatever; retries/backoff live inside it, exactly
where the reference keeps them (network_helpers.py:24-98).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def fetch_with_cache(
    keys: DataFrame,
    cache: DataFrame | None,
    key_col: str,
    fetcher: Callable[[list], pd.DataFrame],
    result_schema: StructType,
    fetch_parallelism: int = 4,
    batch_size: int = 50,
) -> DataFrame:
    """Return one row per key: cached rows verbatim, missing keys fetched.

    ``fetcher(keys_batch)`` must return a pandas frame matching
    ``result_schema`` (which must include ``key_col``). Batch size 50
    mirrors the reference's wbgetentities chunking
    (wikidata_helpers.py:188-298).
    """
    distinct_keys = keys.select(key_col).distinct()
    if cache is not None:
        hits = cache.join(distinct_keys, key_col, "left_semi")
        misses = distinct_keys.join(cache, key_col, "left_anti")
    else:
        hits = None
        misses = distinct_keys

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks = pdf[key_col].tolist()
            for i in range(0, len(ks), batch_size):
                out = fetcher(ks[i : i + batch_size])
                if len(out):
                    yield out

    fetched = misses.repartition(fetch_parallelism).mapInPandas(
        fetch_partition, schema=result_schema
    )
    if hits is None:
        return fetched
    return hits.unionByName(fetched, allowMissingColumns=True)
