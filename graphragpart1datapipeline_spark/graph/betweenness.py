"""Hop-bounded sampled betweenness centrality — Brandes' dependency
accumulation (Brandes 2001) from a sampled source set (Brandes & Pich
2007), truncated at ``max_hops`` (Borgatti's k-betweenness): the
bridging-node detector for entity graphs (which entities broker
between communities — complementary to PageRank's popularity and
k-core's density).

Exactness contract: the per-source dependency recursion

    delta(v) = sum_{w in succ(v)} sigma(v)/sigma(w) * (1 + delta(w))

is computed in SCALED INTEGERS (the repo's PageRank/Leiden pattern):
D(v) = sum_w (sigma(v) * (SCALE + D(w))) DIV sigma(w), all BIGINT, so
the result is a pure function of the graph — bit-reproducible across
engines and fully SQL-replayable with an unrolled CTE chain (q198).
Per-term floor truncation biases D down by < out-degree/SCALE — a
deterministic fixed-point definition, not float noise (property-tested
against a driver-side float Brandes within that bound).

Scale shape: forward pass = one frontier-sized join + map-side-
combined groupBy per hop (multi-source: all sources advance in ONE
round, state keyed by (source, node) like the q193 BFS); backward pass
= one level-sized join per hop. Everything is edge- or state-sized;
rounds are bounded by ``max_hops`` (2-4 for serving graphs), sources
by the sample size. sigma and D carry an in-plan overflow guard
(raise_error past 2^62 operand products — loud, never silent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def betweenness_sampled(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    scale: int = 10**6,
    directed: bool = False,
) -> DataFrame:
    """Returns (id, bc_scaled): bc_scaled = SCALE * sum over sampled
    sources of the hop-bounded Brandes dependency of ``id`` — a scaled
    BIGINT (divide by ``scale`` for the float value; for the undirected
    all-sources convention additionally halve). Sources' own-BFS roots
    are excluded (standard Brandes); a source still accumulates
    dependency from OTHER sources' paths. Only nodes with nonzero
    reachable state appear; join back to the node table for zeros."""
    if max_hops < 1:
        raise ValueError(
            f"betweenness_sampled: max_hops must be >= 1, got {max_hops}"
        )
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
    e = e.filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=False)

    lvl = (
        sources.select(F.col(sources.columns[0]).alias("s"))
        .distinct()
        .select("s", F.col("s").alias("v"), F.lit(1).cast("long").alias("sigma"))
        .localCheckpoint(eager=False)
    )
    visited = lvl.select("s", "v")
    levels = [lvl]
    for _ in range(max_hops):
        nxt = (
            e.join(lvl.withColumnRenamed("v", "a"), "a")
            .select("s", F.col("b").alias("v"), "sigma")
            .join(visited, ["s", "v"], "left_anti")
            .groupBy("s", "v")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=False)
        )
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("s", "v")).localCheckpoint(
            eager=True
        )
        lvl = nxt

    if len(levels) == 1:
        # no source reached anything — no dependencies at all
        return levels[0].select(
            F.col("v").alias("id"), F.lit(0).cast("long").alias("bc_scaled")
        ).limit(0)

    # Backward dependency accumulation, deepest level first. D = 0 at
    # the deepest level (no successors inside the hop bound).
    guard_cap = 2**62
    delta = levels[-1].select(
        "s", "v", "sigma", F.lit(0).cast("long").alias("D")
    )
    per_level = [delta]
    for L in range(len(levels) - 2, 0, -1):
        succ = delta.select(
            "s",
            F.col("v").alias("b"),
            F.col("sigma").alias("__sw"),
            F.col("D").alias("__dw"),
        )
        base = F.lit(scale) + F.col("__dw")
        term = F.when(
            F.col("sigma") <= F.lit(guard_cap) / base,
            F.expr(f"(sigma * ({scale} + __dw)) DIV __sw"),
        ).otherwise(
            F.raise_error(
                F.lit(
                    "betweenness_sampled: sigma*(scale+D) exceeds 2^62 — "
                    "lower `scale` or `max_hops`"
                )
            )
        )
        # accumulate in decimal(38,0): each guarded term can be near
        # 2^62, so a BIGINT sum of a few terms can wrap silently in
        # non-ANSI mode — decimal sum is exact, then range-checked
        # back to long (loud, never a corrupted negative __dw)
        dec_sum = F.sum(F.col("__t").cast("decimal(38,0)"))
        checked = F.when(
            dec_sum <= F.lit(guard_cap).cast("decimal(38,0)"),
            dec_sum.cast("long"),
        ).otherwise(
            F.raise_error(
                F.lit(
                    "betweenness_sampled: dependency sum exceeds 2^62 — "
                    "lower `scale` or `max_hops`"
                )
            )
        )
        dsum = (
            levels[L]
            .join(e.withColumnRenamed("a", "v"), "v")
            .join(succ, ["s", "b"])
            .select("s", "v", term.alias("__t"))
            .groupBy("s", "v")
            .agg(checked.alias("D"))
        )
        delta = (
            levels[L]
            .join(dsum, ["s", "v"], "left")
            .select("s", "v", "sigma", F.coalesce("D", F.lit(0)).alias("D"))
            .localCheckpoint(eager=False)
        )
        per_level.append(delta)

    alld = per_level[0]
    for d in per_level[1:]:
        alld = alld.unionByName(d)
    total = F.sum(F.col("D").cast("decimal(38,0)"))
    total_checked = F.when(
        total <= F.lit(guard_cap).cast("decimal(38,0)"),
        total.cast("long"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "betweenness_sampled: bc sum exceeds 2^62 — "
                "lower `scale` or the source sample size"
            )
        )
    )
    return (
        alld.groupBy(F.col("v").alias("id"))
        .agg(total_checked.alias("bc_scaled"))
    )
