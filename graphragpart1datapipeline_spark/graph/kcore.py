"""k-core decomposition by iterative peeling (graph-cohesion G-op next
to triangles/PageRank/communities; standard corpus-graph denoising —
drop low-connectivity entities before community detection).

Each round: compute degrees over the current edge set, keep nodes with
degree ≥ k, keep edges whose BOTH endpoints survive. The fixed point is
the k-core. The result is a pure function of the graph (no seeds, no
partition sensitivity), so a fixed-round run replays exactly in any
engine — the oracle unrolls the same rounds as SQL CTEs (same pattern
as the distributed-Louvain oracle).

Scale shape per round: one degree groupBy (map-side combined) + two
semi-joins of the edge list against the surviving-node set (node-keyed,
AQE-broadcast when the frontier shrinks). Edges are localCheckpoint'd
per round to keep the plan flat (the iterative-op pattern shared with
label_propagation_communities / pagerank). Rounds needed = peeling
depth, typically O(log n) in practice; pass ``rounds`` ≥ the expected
depth or check the returned round count via ``until_fixed_point``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_nodes(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    until_fixed_point: bool = False,
    checkpoint: bool = True,
    assume_canonical: bool = False,
) -> DataFrame:
    """Nodes surviving ``rounds`` peeling rounds toward the k-core,
    with their degree in the peeled graph: (node, degree). With
    ``until_fixed_point=True``, keeps peeling until no node drops
    (one extra count job per round to detect convergence) — the exact
    k-core regardless of depth."""
    if assume_canonical:
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    if checkpoint:
        e = e.localCheckpoint(eager=True)

    def degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("a").alias("v"))
            .unionAll(ed.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    prev_nodes = None
    r = 0
    while True:
        r += 1
        keep = degrees(e).filter(F.col("degree") >= k)
        e = (
            e.join(keep.select(F.col("v").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("v").alias("b")), "b", "left_semi")
        )
        if checkpoint:
            e = e.localCheckpoint(eager=True)
        if until_fixed_point:
            n = keep.count()
            if prev_nodes is not None and n == prev_nodes:
                break
            prev_nodes = n
        elif r >= rounds:
            break
    return degrees(e).filter(F.col("degree") >= k).select(
        F.col("v").alias("node"), "degree"
    )
