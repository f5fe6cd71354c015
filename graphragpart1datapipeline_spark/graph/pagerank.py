"""Deterministic distributed PageRank over an edge DataFrame.

The reference ranks entities only implicitly (community rollups by
frequency, detect_communities.py); an entity-importance score is the
natural next query a GraphRAG pipeline asks ("which entities anchor
this community's summary?"). PageRank is THE canonical iterative
DataFrame algorithm, so it doubles as the engine's showcase that
iterative computation can be made bit-reproducible.

Exact integer arithmetic throughout (same trick as vector/kmeans.py):
ranks are scaled longs, per-edge contributions use true integer
division (``DIV``), the damping factor is the exact rational 17/20,
and the teleport term is an integer expression — so every iteration
is identical under ANY partitioning, cluster size, or engine, and the
DuckDB oracle replays the full iterative run hash-for-hash (q82).
Floating-point PageRank cannot promise any of that (per-dst summation
order changes the result).

Scale shape per iteration: one shuffle join (ranks × edges on src —
pre-partition/bucket the edge table by src at rest and the join is
co-located) + one map-side-combined groupBy(dst) sum. Dangling-node
mass leaks (documented standard variant); ranks are for ORDERING, not
probability mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "personalized_pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 10**12,
    checkpoint: bool = True,
    broadcast_ranks: bool | None = None,
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Returns (id, rank) with rank a scaled long (initial mass
    ``scale // n`` per node; damping 17/20 exactly).

    update: rank'(v) = (scale*3) DIV (20*n)
                     + (17 * Σ_{u→v} rank(u) DIV outdeg(u)) DIV 20

    Every operation is integer, so the result is a pure function of
    the graph — reproducible across engines (q82's DuckDB oracle
    replays it) and safe to use as a deterministic ordering key.

    ``checkpoint`` materializes the edge/degree and node tables ONCE
    (each round joins them; without it every round re-executes the
    upstream plan that produced ``edges`` — same rationale as
    connected_components). The rounds themselves stay LAZY: with a
    fixed small ``iters`` each rank frame feeds exactly one successor,
    so the composed plan is linear — no per-round action, no
    O(iters) job-submission overhead. (An unbounded convergence loop
    would want per-round checkpoints instead.)

    ``broadcast_ranks``: the rank frame is node-sized while the join
    fans out edge-sized — when the node set fits an executor
    (auto: n ≤ 5M), broadcasting ranks keeps the edge table UNSHUFFLED
    through every round (one map-side-combined groupBy(dst) is the
    round's only exchange). Past that, ranks shuffle-join the edge
    table — pre-bucket the edges by src at rest and only the rank side
    moves.

    ``seeds``: a 1-column (id) frame of teleport targets — PERSONALIZED
    PageRank, the GraphRAG retrieval primitive ("entities related to
    THESE query entities"): all teleport mass (and the initial mass)
    lands on the seed set instead of uniformly, so ranks measure
    proximity to the seeds. Same exact-integer recurrence with
    ``n`` replaced by ``|seeds ∩ nodes|`` in the teleport/init terms,
    gated per node on seed membership — still bit-reproducible and
    SQL-replayable (q166). With ``seeds=None`` the plan is untouched
    classic PageRank (q82).

    ``init_ranks``: a (id, rank) frame seeding the FIRST iteration —
    WARM-START for evolving graphs (the incremental pattern, round 5):
    when edges arrive daily, resume from yesterday's converged ranks
    and run a few rounds instead of ``iters`` from scratch — the power
    iteration contracts toward the new graph's fixed point from ANY
    start, and a near-converged start needs far fewer rounds (unit-
    tested: warm(2) lands closer to converged-new than the stale ranks
    are). Nodes absent from ``init_ranks`` (new nodes) get the default
    init; stale rows for vanished nodes drop in the node join. Still a
    pure integer function of (graph, init) — q181's oracle replays
    old-graph rounds, the hand-off, and new-graph rounds end to end."""
    if weight_col is None:
        e = edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        ).distinct()
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    else:
        # WEIGHTED: duplicate directed edges sum; contributions become
        # (rank * w) DIV wdeg. rank <= ~scale, so keeping w * scale
        # below 2^62 leaves a 2x margin under long overflow for the
        # damping products — enforced lazily in-plan (raise, not
        # silent wraparound).
        w_cap = (1 << 62) // scale
        e = (
            edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight_col).cast("long").alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .select(
                "src",
                "dst",
                F.when(F.col("w") <= F.lit(w_cap), F.col("w"))
                .otherwise(
                    F.raise_error(
                        "pagerank: summed edge weight exceeds the exact "
                        "integer budget (w * scale must stay below 2^62); "
                        "lower scale or pre-normalize weights"
                    )
                )
                .alias("w"),
            )
        )
        # zero/negative summed weight makes the contribution DIV
        # undefined (Spark returns NULL and the mass silently vanishes
        # while the DuckDB oracle diverges) — raise in-plan, like the
        # overflow guard above, instead of dropping rank mass.
        deg = (
            e.groupBy("src")
            .agg(F.sum("w").alias("outdeg"))
            .select(
                "src",
                F.when(F.col("outdeg") > 0, F.col("outdeg"))
                .otherwise(
                    F.raise_error(
                        "pagerank: summed outgoing edge weight must be "
                        "positive for every src (zero/negative weights "
                        "would silently drop contributions); filter or "
                        "pre-normalize weights"
                    )
                )
                .alias("outdeg"),
            )
        )
    e_deg = e.join(deg, "src")
    if checkpoint:
        # ONE materialization executes the upstream edge plan exactly
        # once; everything else (nodes, count, every round) derives
        # from the pinned frame. LAZY (round-10, guide §1.2): the first
        # consuming action (the nodes count below) materializes it in
        # the same job instead of paying a dedicated eager job.
        e_deg = e_deg.localCheckpoint(eager=False)
    # every src survived the inner deg join, so the node set is
    # recoverable from e_deg — no second pass over the input
    nodes = (
        e_deg.select(F.col("src").alias("id"))
        .unionByName(e_deg.select(F.col("dst").alias("id")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0).cast("long").alias("rank"))
    if broadcast_ranks is None:
        broadcast_ranks = n <= 5_000_000
    hint = F.broadcast if broadcast_ranks else (lambda df: df)
    if seeds is not None:
        seed_ids = seeds.select(
            F.col(seeds.columns[0]).alias("id")
        ).distinct()
        # seeds outside the graph carry no mass; flag membership once
        # (node-sized broadcast join, reused by init and every round)
        nodes = nodes.join(
            hint(seed_ids.withColumn("__seed", F.lit(True))), "id", "left"
        ).select("id", F.coalesce("__seed", F.lit(False)).alias("__seed"))
        if checkpoint:
            nodes = nodes.localCheckpoint(eager=False)
        s = nodes.filter(F.col("__seed")).count()
        if s == 0:
            raise ValueError(
                "personalized_pagerank: no seed appears in the graph"
            )
        teleport_col = F.when(
            F.col("__seed"), F.lit((scale * 3) // (20 * s))
        ).otherwise(F.lit(0))
        init_col = F.when(
            F.col("__seed"), F.lit(int(scale // s))
        ).otherwise(F.lit(0))
    else:
        teleport_col = F.lit((scale * 3) // (20 * n))
        init_col = F.lit(int(scale // n))
    if init_ranks is not None:
        ir = init_ranks.select(
            F.col(init_ranks.columns[0]).alias("id"),
            F.col(init_ranks.columns[1]).cast("long").alias("__ir"),
        )
        ranks = nodes.join(hint(ir), "id", "left").select(
            "id",
            F.coalesce("__ir", init_col.cast("long")).alias("rank"),
        )
    else:
        ranks = nodes.select("id", init_col.cast("long").alias("rank"))
    for _ in range(iters):
        contribs = (
            e_deg.join(hint(ranks), e_deg["src"] == ranks["id"])
            .select(
                F.col("dst"),
                (
                    F.expr("rank DIV outdeg")
                    if weight_col is None
                    else F.expr("(rank * w) DIV outdeg")
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("cs"))
        )
        ranks = (
            nodes.join(hint(contribs), nodes["id"] == contribs["dst"], "left")
            .select(
                "id",
                (
                    teleport_col
                    + F.expr("(17 * coalesce(cs, 0)) DIV 20")
                ).cast("long").alias("rank"),
            )
        )
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 10**12,
    checkpoint: bool = True,
    broadcast_ranks: bool | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Personalized PageRank: :func:`pagerank` with all teleport mass
    on ``seeds`` — proximity-to-seeds ranking, the GraphRAG query-time
    retrieval primitive (expand a query's entities into the most
    related graph neighborhood). See :func:`pagerank` for the exact
    integer recurrence and scale shape."""
    return pagerank(
        edges,
        src=src,
        dst=dst,
        iters=iters,
        scale=scale,
        checkpoint=checkpoint,
        broadcast_ranks=broadcast_ranks,
        seeds=seeds,
        weight_col=weight_col,
    )
