"""SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") as a first-class operator —
the paper's recipe exactly, shaped for Spark:

1. k-means cluster the embedding corpus (the engine's exact-integer
   Lloyd trainer, vector/kmeans.py) — clusters BOUND the pair space;
   ``k`` defaults to ``ceil(n / target_cluster_size)`` so expected
   cluster size stays constant as the corpus grows and the
   within-cluster pair scan stays sub-quadratic at any scale,
2. compute cosine similarity ONLY within clusters (unit-normalized
   dot ≥ ``tau``) — never an all-pairs join,
3. collapse transitive duplicate groups (distributed connected
   components),
4. keep the member FARTHEST from its centroid per group (minimum
   centroid-cosine, tie → minimum id) — the paper's
   diversity-preserving survivor choice, deliberately unlike the
   quality-argmax rule of near-dup curation (dedup/embedding.py
   survivors): SemDeDup prunes the redundant CENTER of a semantic
   clump and keeps its most informative outlier.

Reference behavior being re-expressed: the reference pipeline dedups
documents before embedding them (src/data_pipeline/defs/assets/
clean_dataset.py) — this is the semantic-level counterpart a
100 TB training-data pipeline needs once exact/MinHash dedup has run.

Determinism: every stage is exact/replayable — the Lloyd run is
exact-integer, pair scores are in-order double folds, closure is
min-id components, and centroid cosines are half-up rounded at 1e-9
before the argmin (q220 value-replays the full composition against a
recursive-SQL oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["semdedup"]


def semdedup(
    emb: DataFrame,
    tau: float,
    k: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 2,
    seed: str | int = 42,
    target_cluster_size: int = 5000,
) -> tuple[DataFrame, DataFrame]:
    """Semantic dedup of an embedding corpus; returns ``(survivors,
    groups)``.

    ``groups`` labels EVERY input row: (``id_col``, ``centroid_id``,
    ``dup_group``, ``cent_cos``, ``survivor``) — ``dup_group`` is the
    transitive-duplicate component root (a row with no duplicate is
    its own singleton group), ``cent_cos`` the cosine to the row's
    centroid (half-up rounded at 1e-9), ``survivor`` the kept flag.
    ``survivors`` is the filtered projection without the flag — the
    deduplicated corpus ids.

    ``tau``: cosine threshold for "semantic duplicate" (the paper
    sweeps 0.7–0.95 on real encoders; anything in (0, 1]).

    ``k``: cluster count. Default ``ceil(n / target_cluster_size)``
    (one corpus count) — the paper's constant-cluster-size scaling;
    pass an explicit ``k`` to pin it (tests / sf-toy settings).

    Zero-norm vectors can't score a cosine: they never pair (always
    singleton survivors) and their ``cent_cos`` is 0 — the same
    contract as the engine's other cosine paths."""
    from ..graph.communities import connected_components
    from ..vector.kmeans import centroids_df, kmeans_fit
    from ..vector.search import cosine_expr, dot_expr, l2_norm_expr

    if not (0.0 < tau <= 1.0):
        raise ValueError(f"semdedup: tau must be in (0, 1], got {tau}")
    if target_cluster_size < 1:
        raise ValueError(
            "semdedup: target_cluster_size must be >= 1, "
            f"got {target_cluster_size}"
        )
    if k is None:
        n = emb.count()
        if n == 0:
            raise ValueError("semdedup: empty corpus")
        k = max(1, math.ceil(n / target_cluster_size))
    if k < 1:
        raise ValueError(f"semdedup: k must be >= 1, got {k}")

    cents, assign = kmeans_fit(
        emb, vec_col=vec_col, id_col=id_col, k=k, iters=iters, seed=seed
    )
    cents_df = centroids_df(emb.sparkSession, cents).select(
        F.col("cid"), F.col("embedding").alias("__cv")
    )

    nrm = l2_norm_expr(F.col(vec_col))
    uv = (
        emb.join(assign, id_col)
        .filter(nrm > 0)
        .select(
            id_col,
            F.col("centroid_id").alias("__cid"),
            F.transform(
                F.col(vec_col), lambda x: x.cast("double") / nrm
            ).alias("__uv"),
        )
    )
    a = uv.select(
        F.col("__cid"), F.col(id_col).alias("a"), F.col("__uv").alias("__ua")
    )
    b = uv.select(
        F.col("__cid"), F.col(id_col).alias("b"), F.col("__uv").alias("__ub")
    )
    pairs = (
        a.join(b, "__cid")
        .filter(F.col("a") < F.col("b"))
        .filter(dot_expr(F.col("__ua"), F.col("__ub")) >= tau)
        .select("a", "b")
    )
    comp = connected_components(pairs, src="a", dst="b")

    cent_cos = F.floor(
        cosine_expr(F.col(vec_col), F.col("__cv")) * 1e9 + F.lit(0.5)
    ) / F.lit(1e9)
    centcos = (
        emb.join(assign, id_col)
        .join(F.broadcast(cents_df), F.col("centroid_id") == F.col("cid"))
        .select(id_col, "centroid_id", cent_cos.alias("cent_cos"))
    )
    lab = centcos.join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn("dup_group", F.coalesce("component", F.col(id_col)))
    w = Window.partitionBy("dup_group").orderBy(
        F.asc("cent_cos"), F.asc(id_col)
    )
    groups = lab.withColumn(
        "survivor", F.row_number().over(w) == 1
    ).select(id_col, "centroid_id", "dup_group", "cent_cos", "survivor")
    survivors = groups.filter(F.col("survivor")).drop("survivor")
    return survivors, groups
