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
neighborhood function, and :func:`hyperball_neighborhood_function`
warns (``check_regime``) when the final-radius balls are still mostly
below the ~2.5·2^p raw-estimator regime — the "graph too small / p too
large" configuration where the profile is biased.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.sketches import hll_estimate, kmv_hash

__all__ = [
    "hyperball_registers",
    "hyperball_neighborhood_function",
    "effective_diameter",
]

# BIGINT sums of scaled per-node estimates can silently wrap in
# non-ANSI Spark on the dense graphs this module targets (N(t) with
# scale=1e6 crosses 2^63 near ~9.2e12 ball-size-sum) — accumulate in
# decimal(38,0) and range-check back to long, the betweenness_sampled
# guard pattern (graph/betweenness.py).
_GUARD_CAP = 1 << 62


def _checked_long(dec_col, what: str):
    # NULL passes through (an empty graph's SUM is NULL — that is a
    # NULL profile row, not an overflow); only a real out-of-range
    # value raises
    return F.when(dec_col.isNull(), F.lit(None).cast("long")).when(
        (dec_col <= F.lit(_GUARD_CAP).cast("decimal(38,0)"))
        & (dec_col >= F.lit(-_GUARD_CAP).cast("decimal(38,0)")),
        dec_col.cast("long"),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"hyperball: {what} exceeds 2^62 — lower `scale` "
                "(or the quantile grid) so the scaled profile fits a long"
            )
        )
    )


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
    check_regime: bool = True,
) -> DataFrame:
    """The neighborhood-function profile: one row per radius t in
    [0, max_t] with ``nf_est_scaled`` = Σ_v floor(est|ball(v,t)|·scale
    + 0.5) (an exact BIGINT — the per-node terms accumulate in
    decimal(38,0) and are range-checked back to long, so a dense graph
    raises loudly instead of wrapping; divide by ``scale`` for the
    float N(t)) and ``n_nodes``. Effective diameter at quantile q is
    the smallest t with N(t) ≥ q·N(max_t) — read it off the returned
    profile (or hand it to :func:`effective_diameter`).

    ``check_regime``: the raw HLL estimator is biased below ball sizes
    of ~2.5·2^p (Flajolet's small-range regime). When most final-radius
    balls are still below that threshold — a graph too small or a ``p``
    too large for raw estimation — the profile is systematically off,
    so this runs one bounded aggregate over the t=max_t estimates and
    emits a ``UserWarning`` with the measured fraction (lower ``p``,
    or use exact BFS for a graph this small). Never silent."""
    regs_by_t = hyperball_registers(edges, max_t, p, src, dst, directed)
    m = 1 << p
    out = None
    for t, regs in enumerate(regs_by_t):
        est = hll_estimate(regs, ["node"], p)
        row = est.agg(
            F.lit(t).cast("long").alias("t"),
            _checked_long(
                F.sum(
                    F.floor(F.col("est_ndv") * scale + F.lit(0.5)).cast(
                        "decimal(38,0)"
                    )
                ),
                "Σ scaled ball estimate",
            ).alias("nf_est_scaled"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
        out = row if out is None else out.unionByName(row)
    if check_regime:
        final = hll_estimate(regs_by_t[-1], ["node"], p)
        below, total = final.agg(
            F.sum(
                F.when(F.col("est_ndv") < 2.5 * m, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ),
            F.count(F.lit(1)),
        ).first()
        if total and below is not None and below * 2 > total:
            warnings.warn(
                "hyperball_neighborhood_function: "
                f"{below}/{total} balls at t={max_t} estimate below the "
                f"raw-HLL regime threshold 2.5*2^p = {2.5 * m:.0f} — the "
                "profile is biased at this graph size / p; lower p or "
                "compute the neighborhood function exactly (graph/bfs)",
                UserWarning,
                stacklevel=2,
            )
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
    (nf·1000 ≥ q_milli·nf_max, compared in decimal(38,0) so dense-graph
    magnitudes can't wrap a BIGINT multiply), so it replays exactly.

    Boldi-Vigna interpolation: the fractional effective diameter is
    ``(effective_t - 1) + (q·N(max) - N(t-1)) / (N(t) - N(t-1))`` —
    emitted as the EXACT RATIONAL ``interp_num / interp_den`` over the
    scaled-long profile (num = q_milli·nf_max − 1000·nf_prev,
    den = 1000·(nf_at_t − nf_prev); both range-checked to long), so
    the fractional statistic replays bit-exactly too. At t = 0 the
    rational is 1/1 — the exact-crossing convention (num == den ⇒
    fraction 1), so the float formula below yields 0 there, matching
    the Boldi-Vigna definition; den > 0 is structural for t > 0 —
    minimality of t forces N(t−1) below the threshold ≤ N(t). The
    float diameter is ``effective_t - 1 + interp_num/interp_den``.

    Returns (q_milli, effective_t, nf_at_t, nf_max, interp_num,
    interp_den)."""
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
    wlag = Window.orderBy(F.asc("t"))
    prof = profile.select("t", "nf_est_scaled").withColumn(
        "__nf_prev", F.lag("nf_est_scaled").over(wlag)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    thresh = dec(F.col("q_milli")) * dec(F.col("__nf_max"))
    cand = (
        prof.crossJoin(F.broadcast(mx))
        .select(
            "t",
            "nf_est_scaled",
            "__nf_prev",
            "__nf_max",
            F.explode(
                F.array(*[F.lit(m).cast("long") for m in millis])
            ).alias("q_milli"),
        )
        .filter(dec(F.col("nf_est_scaled")) * 1000 >= thresh)
    )
    w = Window.partitionBy("q_milli").orderBy(F.asc("t"))
    num = F.when(F.col("__nf_prev").isNull(), F.lit(1).cast("long")).otherwise(
        _checked_long(
            thresh - dec(F.col("__nf_prev")) * 1000, "interpolation numerator"
        )
    )
    den = F.when(F.col("__nf_prev").isNull(), F.lit(1).cast("long")).otherwise(
        _checked_long(
            (dec(F.col("nf_est_scaled")) - dec(F.col("__nf_prev"))) * 1000,
            "interpolation denominator",
        )
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "q_milli",
            F.col("t").alias("effective_t"),
            F.col("nf_est_scaled").alias("nf_at_t"),
            F.col("__nf_max").alias("nf_max"),
            num.alias("interp_num"),
            den.alias("interp_den"),
        )
        .orderBy("q_milli")
    )
