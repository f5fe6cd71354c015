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


def dedup_keep_best(
    df,
    dup_pairs,
    quality,
    id_col: str = "doc_id",
    pair_a: str = "a",
    pair_b: str = "b",
):
    """QUALITY-aware survivor selection — the curation rule real
    pipelines want instead of keep-smallest-id: given verified
    duplicate pairs, group documents into TRANSITIVE clusters
    (connected components, so A~B~C collapses to one survivor even
    when A,C never paired directly) and keep the highest-``quality``
    member per cluster, tie → smallest id. Returns the surviving rows
    of ``df`` plus (cluster_id, quality).

    ``quality`` is a Column expression over ``df``'s columns (e.g.
    ``text.analysis.quality_score("text")``) — passed as an expression
    so the score computes in the SAME scan that reads the documents,
    never a second pass.

    Scale shape: CC is O(log diameter) rounds over the pair list
    (pairs ≪ corpus); cluster labels join back id-keyed; the pick is
    one window over cluster-sized groups. Documents in no pair are
    their own cluster and always survive (left join + coalesce —
    the corpus never shrinks by accident)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..graph.communities import connected_components

    comp = connected_components(
        dup_pairs.select(pair_a, pair_b), src=pair_a, dst=pair_b
    ).withColumnRenamed("id", id_col)
    labeled = (
        df.withColumn("__q", quality)
        .join(comp, id_col, "left")
        .withColumn(
            "cluster_id", F.coalesce("component", F.col(id_col))
        )
        .drop("component")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("__q"), F.asc(id_col)
    )
    return (
        labeled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("__q", "quality")
    )
