"""Multi-source BFS hop distances — the graph-locality primitive a
GraphRAG serving tier needs (how many hops is this entity from the
query's seed set?) and the classic Pregel iteration pattern.

Reference parity: the reference's multi-hop Cypher traversals
(`/root/reference` graph query surface, cf. q31's citations) bound
expansion by hop count; ``bfs_distances`` is the set-at-once version:
ONE run labels every node with its exact hop distance to the nearest
seed instead of one traversal per query.

Scale shape: each round joins the FRONTIER (nodes first reached last
round) against the edge list — work is proportional to the frontier's
out-edges, never to the full node set; visited nodes are excluded with
a left-anti join before the min-rollup. The edge list is materialized
once (`localCheckpoint`) because every round re-joins it. Rounds are
bounded by ``max_hops`` (serving queries want 2-4 hops, not graph
diameter). All arithmetic is integer; nearest-seed tie-break is MIN
seed id, so the result is deterministic and SQL-replayable with a
recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    directed: bool = False,
) -> DataFrame:
    """Exact hop distance from every reachable node to its nearest
    seed, within ``max_hops``. Returns (id, dist, nearest_seed).

    ``seeds`` is a 1-column frame (``id``). ``nearest_seed`` is the
    MINIMUM seed id among seeds at the minimal distance — propagating
    the running min along frontier expansion is exact: any seed
    reaching node v at distance d must reach one of v's predecessors
    at d-1, and v stays unvisited until round d, so the min over
    predecessor labels is the min over seeds at distance exactly d.
    """
    if max_hops < 0:
        raise ValueError(f"bfs_distances: max_hops must be >= 0, got {max_hops}")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
    e = e.filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=False)

    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("id"))
        .distinct()
        .select(
            "id",
            F.lit(0).cast("int").alias("dist"),
            F.col("id").alias("nearest_seed"),
        )
        .localCheckpoint(eager=False)
    )
    frontier = dist
    for hop in range(1, max_hops + 1):
        reached = (
            e.join(frontier.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"), "nearest_seed")
            .join(dist.select("id"), "id", "left_anti")
            .groupBy("id")
            .agg(F.min("nearest_seed").alias("nearest_seed"))
            .select(
                "id", F.lit(hop).cast("int").alias("dist"), "nearest_seed"
            )
            .localCheckpoint(eager=False)
        )
        if reached.limit(1).count() == 0:
            break
        dist = dist.unionByName(reached).localCheckpoint(eager=False)
        frontier = reached
    return dist


def bfs_per_source_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    directed: bool = False,
) -> DataFrame:
    """PER-SOURCE hop distances: (source, id, dist) for every source
    in one pass — the state is keyed by (source, node) so all sources'
    BFS fronts advance together (the q198 forward-pass shape), instead
    of one run per source. This is what eccentricity/diameter
    estimation needs, where :func:`bfs_distances`' min-over-seeds
    collapse would be wrong."""
    if max_hops < 0:
        raise ValueError(
            f"bfs_per_source_distances: max_hops must be >= 0, got {max_hops}"
        )
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
    e = e.filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=False)
    dist = (
        sources.select(F.col(sources.columns[0]).alias("source"))
        .distinct()
        .select(
            "source",
            F.col("source").alias("id"),
            F.lit(0).cast("int").alias("dist"),
        )
        .localCheckpoint(eager=False)
    )
    frontier = dist
    for hop in range(1, max_hops + 1):
        reached = (
            e.join(frontier.withColumnRenamed("id", "a"), "a")
            .select("source", F.col("b").alias("id"))
            .distinct()
            .join(dist.select("source", "id"), ["source", "id"], "left_anti")
            .select(
                "source", "id", F.lit(hop).cast("int").alias("dist")
            )
            .localCheckpoint(eager=False)
        )
        if reached.limit(1).count() == 0:
            break
        dist = dist.unionByName(reached).localCheckpoint(eager=False)
        frontier = reached
    return dist
