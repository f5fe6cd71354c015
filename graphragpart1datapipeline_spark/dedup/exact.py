"""Exact deduplication via content-hash groupBy.

At 100 TB the right plan is: project (id, hash) → hash-aggregate keeping
min id per hash → semi-join survivors back. The wide text/payload column
never shuffles — only the 32-byte hash and the id do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..text.analysis import document_fingerprint


def _content_key(df: DataFrame, text_col: str, normalize: bool) -> Column:
    if normalize:
        return document_fingerprint(text_col, bits_hex=32)
    return F.md5(F.col(text_col))


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep exactly one row per distinct content (the one with the
    smallest id — deterministic winner). Returns the surviving rows with
    all original columns."""
    keyed = df.withColumn("__key", _content_key(df, text_col, normalize))
    winners = keyed.groupBy("__key").agg(F.min(id_col).alias(id_col))
    return (
        keyed.join(winners, ["__key", id_col], "left_semi").drop("__key")
    )


def exact_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Duplicate-group report: (content_key, n_dups, keep_id) for every
    content appearing more than once."""
    keyed = df.select(
        _content_key(df, text_col, normalize).alias("content_key"), F.col(id_col)
    )
    return (
        keyed.groupBy("content_key")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )
