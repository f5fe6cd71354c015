"""Leakage-safe train/val/test splits.

A plain per-document split (hash_split) contaminates evaluation the
moment the corpus contains near-duplicates: doc A lands in train, its
near-copy B in test, and the model is graded on memorization. The fix
is to split by DUPLICATE GROUP, not by document — every document of a
near-dup component travels to the same split.

Composition, all existing scale paths: verified near-dup pairs (any of
the dedup family — MinHash/LSH, SimHash, embedding) → distributed
connected components (large-star/small-star pointer jumping) → each
document keyed by its component root (its own id when it has no
duplicates) → md5-bucket split on the ROOT key (hash_split rule).
Deterministic end to end: the assignment is a pure function of
(pairs, seed), reproducible across engines — q87 value-checks the full
closure + assignment against DuckDB's recursive-CTE replay.

Scale: components is O(log d) join rounds over the PAIR table (tiny
after LSH); the corpus itself sees one left join + a map-only bucket
rule. Growing the corpus never reshuffles existing docs between splits
unless a new duplicate link merges their components — exactly the
semantics an eval-contamination guard needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.communities import connected_components
from ..operators.relational import hash_split


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    seed: str | int = 42,
    src: str = "a",
    dst: str = "b",
    split_col: str = "split",
) -> DataFrame:
    """Assign ``split_col`` so that documents connected by
    ``dup_pairs`` (directly or transitively) always share a split.
    Returns ``docs`` + the split column; the internal root key is
    dropped."""
    comp = connected_components(dup_pairs, src=src, dst=dst).withColumnRenamed(
        "id", id_col
    )
    rooted = docs.join(comp, id_col, "left").withColumn(
        "__root", F.coalesce(F.col("component"), F.col(id_col))
    )
    out = hash_split(
        rooted, "__root", weights=tuple(weights), seed=seed,
        split_col=split_col,
    )
    return out.drop("component", "__root")
