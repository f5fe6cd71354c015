"""HyperBall (Boldi & Vigna 2013, "In-core computation of geometric
centralities with HyperBall"): the neighborhood function / effective
diameter of a graph with O(n · 2^p) state instead of the O(n²)
all-pairs distance table exact eccentricity needs (q202's sampling
collapses at 100× graph scale; this is the form that survives).

Each node carries a mergeable HLL register set (the engine's exact
md5-derived registers, operators/sketches.py) approximating its
distance-t BALL; one round of

    regs_{t+1}(v) = max(regs_t(v), max_{(v,u) in E} regs_t(u))

— a frontier-shaped edge join + a map-side-combined (node, register)
max — grows every ball by one hop SIMULTANEOUSLY for all nodes. After
round t, est(regs_t(v)) ≈ |ball(v, t)| and the neighborhood function
N(t) = Σ_v |ball(v, t)| falls out as one aggregation.

Determinism contract: registers are exact integer arithmetic (md5
hash, shift, bit-length) and max-merge is order-independent, so the
register tables are bit-identical across engines/partitionings; the
per-node raw-HLL estimate is the module's standard exact-DECIMAL sum +
one double division, and the SUM over nodes is taken on
half-up-scaled LONGS (floor(est·scale + 0.5)) so it is
order-independent and SQL-replayable (q213 value-checks registers,
per-node estimates, and the scaled sums against DuckDB).

Accuracy: the raw estimator is the right regime for the dense serving
graphs this targets (ball sizes ≳ 2.5·2^p within a hop or two); the
q213 unit gate additionally compares N(t) against the exact BFS
neighborhood function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.sketches import hll_estimate, kmv_hash

__all__ = [
    "hyperball_registers",
    "hyperball_neighborhood_function",
    "effective_diameter",
]


def hyperball_registers(
    edges: DataFrame,
    max_t: int,
    p: int = 4,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
) -> list[DataFrame]:
    """Register tables per radius: element ``t`` is the long-form
    (node, register, rho) frame whose per-node estimate approximates
    |ball(node, t)|. ``t = 0`` is each node's own one-hot registers.
    Rounds are edge-sized joins + (node, register)-keyed max-merges —
    never node² state."""
    if max_t < 0:
        raise ValueError(f"hyperball_registers: max_t must be >= 0, got {max_t}")
    if not (2 <= p <= 12):
        raise ValueError(f"hyperball_registers: p must be in [2, 12], got {p}")
    m = 1 << p
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
    e = (
        e.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    # same register/rho arithmetic as hll_registers (sketches.py): the
    # node id IS the hashed value, so every engine agrees bit for bit
    h = kmv_hash(F.col("node"))
    w = F.shiftright(h, p)
    nbits = F.when(w == 0, F.lit(0)).otherwise(F.length(F.conv(w, 10, 2)))
    rho = (F.lit(61 - p) - nbits).cast("int")
    regs = nodes.select(
        "node", (h % m).alias("register"), rho.alias("rho")
    ).localCheckpoint(eager=True)
    out = [regs]
    for _ in range(max_t):
        prop = e.join(regs.withColumnRenamed("node", "b"), "b").select(
            F.col("a").alias("node"), "register", "rho"
        )
        regs = (
            regs.unionByName(prop)
            .groupBy("node", "register")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
        out.append(regs)
    return out


def hyperball_neighborhood_function(
    edges: DataFrame,
    max_t: int,
    p: int = 4,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    scale: int = 10**6,
) -> DataFrame:
    """The neighborhood-function profile: one row per radius t in
    [0, max_t] with ``nf_est_scaled`` = Σ_v floor(est|ball(v,t)|·scale
    + 0.5) (an exact BIGINT — divide by ``scale`` for the float N(t))
    and ``n_nodes``. Effective diameter at quantile q is the smallest
    t with N(t) ≥ q·N(max_t) — read it off the returned profile."""
    regs_by_t = hyperball_registers(edges, max_t, p, src, dst, directed)
    out = None
    for t, regs in enumerate(regs_by_t):
        est = hll_estimate(regs, ["node"], p)
        row = est.agg(
            F.lit(t).cast("long").alias("t"),
            F.sum(
                F.floor(F.col("est_ndv") * scale + F.lit(0.5)).cast("long")
            ).alias("nf_est_scaled"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("t")


def effective_diameter(
    profile: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Read the effective diameter off a
    :func:`hyperball_neighborhood_function` profile: for each quantile
    q, the smallest radius t whose estimated neighborhood function
    reaches q · N(t_max) — the standard HyperBall deliverable (Boldi-
    Vigna's 90%-effective-diameter). ALL-INTEGER decision
    (nf·1000 ≥ q_milli·nf_max on the scaled longs), so it replays
    exactly. Returns (q_milli, effective_t, nf_at_t, nf_max)."""
    if not qs:
        raise ValueError("effective_diameter: qs is empty")
    millis = sorted({int(round(q * 1000)) for q in qs})
    if any(m <= 0 or m > 1000 for m in millis):
        raise ValueError(
            f"effective_diameter: quantiles must be in (0, 1], got {qs}"
        )
    mx = profile.orderBy(F.desc("t")).limit(1).select(
        F.col("nf_est_scaled").alias("__nf_max")
    )
    cand = (
        profile.select("t", "nf_est_scaled")
        .crossJoin(F.broadcast(mx))
        .select(
            "t",
            "nf_est_scaled",
            "__nf_max",
            F.explode(
                F.array(*[F.lit(m).cast("long") for m in millis])
            ).alias("q_milli"),
        )
        .filter(
            F.col("nf_est_scaled") * 1000
            >= F.col("q_milli") * F.col("__nf_max")
        )
    )
    w = Window.partitionBy("q_milli").orderBy(F.asc("t"))
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "q_milli",
            F.col("t").alias("effective_t"),
            F.col("nf_est_scaled").alias("nf_at_t"),
            F.col("__nf_max").alias("nf_max"),
        )
        .orderBy("q_milli")
    )
