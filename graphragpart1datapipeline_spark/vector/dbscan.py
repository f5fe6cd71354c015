"""DBSCAN (Ester et al. KDD'96) as relational algebra over a
precomputed ε-neighbor pair frame — density clustering for embedding
spaces where k-means' spherical-k assumption fails (noise points stay
noise instead of polluting a centroid).

Decomposition: given undirected unique pairs (a, b) within ε from ANY
candidate generator — the LSH sign-bucket join
(`dedup.embedding.embedding_near_dup_pairs`, the 100 TB scale path) or
an exact generator for oracles — DBSCAN is:

1. degree count      → core points (|N_ε(p)| ≥ min_pts, self included)
2. core–core edges   → connected components = clusters
   (the classic result: density-reachability restricted to core points
   is symmetric, so clusters are exactly CCs of the core subgraph)
3. border points     = non-core with ≥1 core neighbor → attached to
   the MIN cluster id among their core neighbors (deterministic stand-
   in for sklearn's first-visit assignment, which is scan-order-
   dependent and therefore not reproducible)
4. everything else   → noise

Scale shape: two pair-frame groupBys + the O(log d)-round CC driver
(`graph.communities.connected_components`, pointer jumping) + one
broadcast-friendly role join. Never touches vectors — distance work
lives entirely in the candidate generator, so the same clustering code
serves exact, LSH, and IVF-restricted neighbor frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.communities import connected_components


def dbscan_from_pairs(
    nodes: DataFrame,
    pairs: DataFrame,
    min_pts: int = 3,
    id_col: str = "id",
) -> DataFrame:
    """Cluster ``nodes`` (1-column frame of ids) given ε-neighbor
    ``pairs`` (columns a, b; unique undirected, a ≠ b). Returns
    (``id_col``, cluster, role): role ∈ {'core','border','noise'};
    cluster = MIN core-point id of the cluster, NULL for noise.
    ``min_pts`` counts the point itself (sklearn's min_samples)."""
    if min_pts < 1:
        raise ValueError(f"dbscan_from_pairs: min_pts must be >= 1, got {min_pts}")
    ids = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
    sym = (
        pairs.select(F.col("a").alias("id"), F.col("b").alias("nbr"))
        .unionByName(pairs.select(F.col("b").alias("id"), F.col("a").alias("nbr")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("id").agg(F.count(F.lit(1)).alias("__deg"))
    core = deg.filter(F.col("__deg") >= min_pts - 1).select("id")
    if min_pts <= 1:
        core = ids  # every point is core (deg >= 0 trivially)
    core = core.localCheckpoint(eager=True)

    # Clusters = connected components of the core-core subgraph;
    # isolated cores (no core neighbor) become singleton clusters.
    core_edges = (
        sym.join(core, "id")
        .join(core.withColumnRenamed("id", "nbr"), "nbr")
        .select(F.col("id").alias("a"), F.col("nbr").alias("b"))
    )
    cc = connected_components(core_edges, src="a", dst="b")
    core_clusters = (
        core.join(cc, "id", "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("cluster"),
            F.lit("core").alias("role"),
        )
    )

    # Border = non-core with >= 1 core neighbor; attach to the min
    # cluster among core neighbors (deterministic).
    border = (
        sym.join(core.withColumnRenamed("id", "nbr"), "nbr")
        .join(core, "id", "left_anti")
        .join(
            core_clusters.select(
                F.col("id").alias("nbr"), F.col("cluster").alias("__c")
            ),
            "nbr",
        )
        .groupBy("id")
        .agg(F.min("__c").alias("cluster"))
        .select("id", "cluster", F.lit("border").alias("role"))
    )

    labeled = core_clusters.unionByName(border)
    return (
        ids.join(labeled, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce("role", F.lit("noise")).alias("role"),
        )
    )
