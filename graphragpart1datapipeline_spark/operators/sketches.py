"""Deterministic, mergeable sketches for 100 TB profiling.

Spark's built-in sketches (HyperLogLog++ `approx_count_distinct`,
GK `percentile_approx`) are the right defaults in production, but their
internals are engine-specific — no cross-engine oracle can value-check
them (q52 stays rows-only for exactly that reason). The KMV (k minimum
values) distinct-count sketch here trades a slightly worse
accuracy/space curve for *bit-reproducibility*: the sketch is just the
k smallest md5-derived 60-bit hashes of the distinct values, so any
engine that can md5 agrees on every intermediate AND on the final
estimate (q84 value-checks it against DuckDB).

Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
data stream"): with U_k the k-th smallest of n distinct hashes drawn
uniformly from [0, 2^60), E[U_k] ≈ k/(n+1)·2^60, so
``n̂ = (k-1)·2^60 / U_k`` (the unbiased form). When fewer than k
distinct hashes exist the sketch is exhaustive and the count is exact.

Why this matters at scale: the sketch is MERGEABLE — union the hash
sets, keep the k smallest. Per-shard sketches roll up to the global
sketch without re-reading data, which is what a 100 TB profiling pass
needs (sketch each partition/day once, merge driver-side or in a
second tiny agg). `kmv_merge_sketches` implements that rollup and the
property test asserts merge(shard sketches) == sketch(union).

Plan shape: one map-side-combined `distinct` on (group, hash) — the
only full shuffle, and partial aggregation collapses duplicates before
the exchange — then a per-group window over the (tiny) distinct-hash
stream to keep the k smallest. No collect, no UDFs, whole-stage
codegen end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TWO_60 = float(1 << 60)  # 2^60 as an exactly-representable double


def kmv_hash(col: Column | str) -> Column:
    """60-bit uniform hash: md5 → first 15 hex digits → bigint.

    Identical in any engine with md5 (DuckDB:
    ``CAST(CAST('0x' || substring(md5(x), 1, 15) AS UBIGINT) AS BIGINT)``).
    60 bits keeps every downstream product inside signed-64 range.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _k_smallest(hashes: DataFrame, groups: list[str], k: int) -> DataFrame:
    """Rows with the k smallest ``__h`` per group. With no groups the
    naive plan windows over ``partitionBy(lit(1))`` — ALL distinct
    hashes through one task, O(distinct) in a single thread. So the
    ungrouped path pre-reduces first: a local top-k per input partition
    (window keyed by ``spark_partition_id`` — parallel, each task sorts
    only its own slice), leaving the final single-task window at most
    ``num_partitions * k`` rows. The global k-smallest set is invariant
    to how rows were sliced locally, so results are unchanged."""
    if not groups:
        local_w = Window.partitionBy("__pid").orderBy("__h")
        hashes = (
            hashes.withColumn("__pid", F.spark_partition_id())
            .withColumn("__lrn", F.row_number().over(local_w))
            .filter(F.col("__lrn") <= k)
            .drop("__pid", "__lrn")
        )
    w = Window.partitionBy(*[F.col(g) for g in groups] or [F.lit(1)]).orderBy(
        "__h"
    )
    return hashes.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    k: int = 256,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: group cols + ``sketch_size`` (min(k, true distinct)),
    ``kth_hash`` (the largest retained hash) and ``est_distinct``
    (double; exact count when the sketch is exhaustive). The estimate
    is computed as ``(k-1) * 2^60 / kth_hash`` in IEEE double — both
    factors are exactly representable, so any engine reproduces it
    bit-for-bit.
    """
    groups = list(group_cols)
    hashes = (
        df.select(*groups, kmv_hash(value_col).alias("__h"))
        .distinct()  # map-side partial agg collapses dups pre-shuffle
    )
    kept = _k_smallest(hashes, groups, k)
    return kept.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("sketch_size"),
        F.max("__h").alias("kth_hash"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(
            F.lit(float(k - 1)) * F.lit(TWO_60) / F.max("__h").cast("double")
        )
        .alias("est_distinct"),
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    k: int = 256,
) -> DataFrame:
    """Materialize the sketch itself: group cols + ``kmv`` (sorted array
    of the k smallest distinct hashes). Store per shard/partition/day,
    then roll up with :func:`kmv_merge_sketches`."""
    groups = list(group_cols)
    hashes = df.select(*groups, kmv_hash(value_col).alias("__h")).distinct()
    kept = _k_smallest(hashes, groups, k)
    return kept.groupBy(*groups).agg(
        F.array_sort(F.collect_list("__h")).alias("kmv")
    )


def kmv_merge_sketches(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
    k: int = 256,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Merge per-shard sketches to one sketch per group: explode, dedupe,
    keep the k smallest — the associative/commutative rollup that lets a
    100 TB profile run as per-partition sketches + a tiny second agg."""
    groups = list(group_cols)
    exploded = sketches.select(
        *groups, F.explode(sketch_col).alias("__h")
    ).distinct()
    kept = _k_smallest(exploded, groups, k)
    return kept.groupBy(*groups).agg(
        F.array_sort(F.collect_list("__h")).alias(sketch_col)
    )


def kmv_estimate_from_sketch(
    sketches: DataFrame, k: int = 256, sketch_col: str = "kmv"
) -> DataFrame:
    """Estimate column from a materialized sketch (same arithmetic as
    :func:`kmv_distinct`)."""
    size = F.size(sketch_col)
    kth = F.element_at(F.col(sketch_col), size).cast("double")
    return sketches.withColumn(
        "est_distinct",
        F.when(size < k, size.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(TWO_60) / kth
        ),
    ).withColumn("sketch_size", size.cast("long"))


def mg_candidates(src: DataFrame, cap: int) -> DataFrame:
    """Per-partition Misra-Gries candidate pass over a 1-column
    ``(v string)`` frame: returns the distinct union of each
    partition's capacity-``cap`` summary — a SUPERSET of every value
    with global count > n/(cap+1) (and therefore of any count > n/k
    for k <= cap). Arrow-batched, O(cap) state per partition; shared
    by :func:`heavy_hitters` and the join-skew hot-key detector."""

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf["v"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < cap:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"v": list(counters.keys())})

    return src.mapInPandas(mg, "v string").distinct()


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    capacity: int | None = None,
) -> DataFrame:
    """Exact phi-heavy-hitters (items with count > n/k) in two passes:
    Misra-Gries candidate generation per partition, then an exact
    recount restricted to candidates. Returns (value, cnt), the items
    whose TRUE count strictly exceeds n/k — never an approximation.

    Why two passes beat one: the naive ``groupBy(col).count()`` shuffles
    every distinct value; at 100 TB the token-frequency long tail IS the
    shuffle. Misra-Gries (capacity m >= k summary per partition) has the
    pigeonhole guarantee that any value with global count > n/k exceeds
    n_p/k on at least one partition and therefore survives that
    partition's summary — so the union of per-partition candidates is a
    SUPERSET of the true heavy hitters (soundness does not depend on
    arrival order, even though the summary contents do). Pass 2 then
    recounts ONLY rows matching a candidate (broadcast semi-join before
    the shuffle) and applies the exact integer threshold cnt*k > n.
    The output is deterministic: Misra-Gries order-sensitivity can only
    add false candidates, which the recount removes.

    The candidate pass is the module's one Python seam (mapInPandas,
    Arrow-batched, O(capacity) state per partition); everything else is
    codegen. ``capacity`` defaults to 2k (halves false candidates for
    one extra dict slot per partition).
    """
    if capacity is not None and capacity < k:
        raise ValueError(
            f"heavy_hitters: capacity ({capacity}) must be >= k ({k}) — "
            "the Misra-Gries superset guarantee (every value with count "
            "> n/k survives a capacity-m summary) requires m >= k"
        )
    cap = capacity or 2 * k
    src = df.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    candidates = mg_candidates(src, cap)
    n = src.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    return (
        src.join(F.broadcast(candidates), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * k > F.col("__n"))
        .select(F.col("v").alias("value"), "cnt")
    )


def kmv_jaccard_estimate(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    join_cols: Sequence[str],
    k: int = 256,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Set-overlap estimation from two KMV sketches WITHOUT touching the
    underlying data (Beyer et al. 2007): with M the k smallest hashes of
    A ∪ B (merge of the two sketches), rho = |M ∩ A_k ∩ B_k| / |M| is an
    unbiased Jaccard estimator; intersection ≈ rho × |A ∪ B|-estimate.

    Everything is row-local array arithmetic on two <=k arrays (the
    sketches join on ``join_cols``, typically a profile date or shard
    key), so comparing the vocabularies of two 100 TB corpus snapshots
    costs two sketch scans + a tiny join. Deterministic md5 hashes make
    the whole estimate — union size, rho, Jaccard, intersection —
    bit-reproducible and SQL-replayable, which HLL intersections are
    not.

    Returns join_cols + (union_est, jaccard_est, intersection_est).
    """
    a = sketch_a.select(*join_cols, F.col(sketch_col).alias("__a"))
    b = sketch_b.select(*join_cols, F.col(sketch_col).alias("__b"))
    j = a.join(b, list(join_cols))
    merged = F.slice(
        F.array_sort(F.array_union("__a", "__b")), 1, k
    )
    m_size = F.size(merged)
    kth = F.element_at(merged, m_size).cast("double")
    union_est = F.when(m_size < k, m_size.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO_60) / kth
    )
    shared = F.size(
        F.array_intersect(merged, F.array_intersect("__a", "__b"))
    )
    rho = shared.cast("double") / m_size
    return j.select(
        *join_cols,
        union_est.alias("union_est"),
        rho.alias("jaccard_est"),
        (rho * union_est).alias("intersection_est"),
    )
