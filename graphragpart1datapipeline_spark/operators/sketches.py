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


# ---------------------------------------------------------------------------
# Bloom filter (deterministic, SQL-replayable) — shuffle pruning for joins
# ---------------------------------------------------------------------------


def _pow2_long(exp: Column, max_exp: int) -> Column:
    """2**exp as a BIGINT via a literal lookup array (Spark's shiftleft
    needs a literal shift count; an element_at into a 2^j table is the
    codegen-friendly equivalent for a column-valued exponent)."""
    table = F.array(*[F.lit(1 << j).cast("long") for j in range(max_exp + 1)])
    return F.element_at(table, (exp + 1).cast("int"))


def _double_hash_mod(col: Column | str, modulus: int) -> tuple[Column, Column]:
    """Two independent uniform hashes reduced mod ``modulus``, from one
    md5: h1 = hex[1..15], h2 = hex[16..30] (both 60-bit, reduced before
    any multiply so Kirsch–Mitzenmacher double hashing stays inside
    signed-64 in every engine). DuckDB replay:
    ``CAST(CAST('0x'||substring(md5(x),1,15) AS UBIGINT) AS BIGINT) % m``."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.md5(c.cast("string"))
    h1 = F.conv(F.substring(s, 1, 15), 16, 10).cast("long") % modulus
    h2 = F.conv(F.substring(s, 16, 15), 16, 10).cast("long") % modulus
    return h1, h2


def bloom_words(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 15,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a Bloom filter over the DISTINCT values of ``key_col`` as a
    sparse table of 32-bit words packed in BIGINTs: (wi, word). One
    distinct + one ``bit_or`` groupBy — both map-side combined. 32 bits
    per word keeps ``1 << bit`` positive, so the packing is identical
    two's-complement-free arithmetic in Spark and DuckDB.

    Why not Spark's built-in runtime bloom pruning: it is
    cost-model-gated and engine-internal; this one is explicit,
    mergeable (bit_or of word tables), persistable, and value-checkable
    cross-engine. At 100 TB the filter for a 100M-key dim at 10 bits/key
    is ~125 MB of words — broadcastable where the dim itself is not.
    """
    if num_bits & (num_bits - 1):
        raise ValueError("bloom_words: num_bits must be a power of two")
    keys = df.select(F.col(key_col).alias("__k")).distinct()
    h1, h2 = _double_hash_mod(F.col("__k"), num_bits)
    idx = keys.select(
        F.explode(
            F.array(*[(h1 + F.lit(i) * h2) % num_bits for i in range(num_hashes)])
        ).alias("idx")
    )
    return (
        idx.select(
            (F.col("idx") / 32).cast("long").alias("wi"),
            _pow2_long((F.col("idx") % 32), 31).alias("mask"),
        )
        .groupBy("wi")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_dense(words: DataFrame, num_bits: int) -> list[int]:
    """Collect the (bounded, sketch-sized: num_bits/32 longs) word table
    into a dense driver-side list for codegen-side membership tests —
    the same bounded-collect pattern as the IVF centroid literals."""
    dense = [0] * (num_bits // 32)
    for row in words.collect():
        dense[int(row["wi"])] = int(row["word"])
    return dense


def bloom_contains(
    col: Column | str,
    dense: list[int],
    num_bits: int,
    num_hashes: int = 5,
) -> Column:
    """Row-local membership test against a dense bloom literal: AND over
    ``num_hashes`` bit probes, each an ``element_at`` into the literal
    array — whole-stage codegen, applied BEFORE any exchange, which is
    the whole point (prune fact-side shuffle input without building a
    join hash relation). No false negatives ever; false positives are
    removed by the real join that follows."""
    h1, h2 = _double_hash_mod(col, num_bits)
    arr = F.array(*[F.lit(w).cast("long") for w in dense])
    checks = []
    for i in range(num_hashes):
        idx = (h1 + F.lit(i) * h2) % num_bits
        mask = _pow2_long(idx % 32, 31)
        checks.append(
            F.element_at(arr, ((idx / 32).cast("long") + 1).cast("int"))
            .bitwiseAND(mask)
            != 0
        )
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_probe(
    df: DataFrame,
    col: str,
    dense: list[int],
    num_bits: int,
    num_hashes: int = 5,
    out_col: str = "bloom_pass",
) -> DataFrame:
    """Frame-level probe: adds boolean ``out_col`` = membership test of
    ``col`` against the dense bloom literal. Same arithmetic as
    :func:`bloom_contains`, but the two md5 hashes are pre-projected in
    their own Project node so the probe chain evaluates them ONCE per
    row instead of once per hash function (measured ~1.4× faster at
    num_hashes=5; CollapseProject keeps the split because the refs are
    non-cheap and multiply used). Use this on the fact-side hot path;
    ``bloom_contains`` remains for composing into arbitrary
    expressions."""
    h1, h2 = _double_hash_mod(F.col(col), num_bits)
    arr = F.array(*[F.lit(w).cast("long") for w in dense])
    pre = df.withColumn("__h1", h1).withColumn("__h2", h2)
    checks = None
    for i in range(num_hashes):
        idx = (F.col("__h1") + F.lit(i) * F.col("__h2")) % num_bits
        mask = _pow2_long(idx % 32, 31)
        c = (
            F.element_at(arr, ((idx / 32).cast("long") + 1).cast("int"))
            .bitwiseAND(mask)
            != 0
        )
        checks = c if checks is None else checks & c
    return pre.withColumn(out_col, checks).drop("__h1", "__h2")


# ---------------------------------------------------------------------------
# Count-min sketch (deterministic) — point frequency + join-size estimation
# ---------------------------------------------------------------------------

def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a counter
    table (d, wi, cnt): ``depth`` rows of ``width`` counters, bucket
    d via (h1 + d*h2) % width. Build = one explode(×depth) + one
    map-side-combined count groupBy over at most depth*width groups —
    the frequency table of a 100 TB corpus in O(depth*width) space,
    MERGEABLE by summing counters (cms_merge), with the one-sided
    guarantee est >= true count (never under)."""
    h1, h2 = _double_hash_mod(F.col(key_col), width)
    # Pre-project the two md5 hashes in their OWN Project node: embedding
    # them in the generator would re-evaluate md5+conv once per (hash,
    # depth) term — 2·depth evals/row (measured 2.3× slower end-to-end).
    # CollapseProject keeps the split because the refs are non-cheap and
    # used depth times each.
    pre = df.select(h1.alias("__h1"), h2.alias("__h2"))
    rows = pre.select(
        F.posexplode(
            F.array(
                *[
                    (F.col("__h1") + F.lit(d) * F.col("__h2")) % width
                    for d in range(depth)
                ]
            )
        ).alias("d", "wi")
    )
    return rows.groupBy("d", "wi").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise sum of two sketches built with identical (depth,
    width) — the shard rollup (sketch each partition/day, merge without
    re-reading). cms(A) + cms(B) == cms(A ∪ B) EXACTLY, which the
    property test asserts."""
    return (
        a.unionByName(b)
        .groupBy("d", "wi")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-frequency estimates for every probe key: explode each probe
    into its ``depth`` buckets, inner-join the counter table on (d, wi)
    (missing counter = 0 can only happen if the estimate is 0 anyway —
    every probed key that occurred sets all its buckets), take the MIN
    over depth. Output: probe columns + ``cms_est``."""
    h1, h2 = _double_hash_mod(F.col(key_col), width)
    p = probes.select(
        F.col(key_col), h1.alias("__h1"), h2.alias("__h2")
    ).select(
        key_col,
        F.posexplode(
            F.array(
                *[
                    (F.col("__h1") + F.lit(d) * F.col("__h2")) % width
                    for d in range(depth)
                ]
            )
        ).alias("d", "wi"),
    )
    return (
        p.join(cms, ["d", "wi"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_join_size_estimate(
    cms_a: DataFrame, cms_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Equi-join cardinality estimate from two sketches ALONE (the
    AMS/CMS inner-product estimator): |A ⋈ B| = Σ_k a_k·b_k is
    upper-bounded by min_d Σ_w A[d,w]·B[d,w]. This is what a
    cost-based optimizer needs to pick join order/strategy at 100 TB —
    computed from two O(depth·width) tables, never touching the data.
    One tiny join on (d, wi) + one depth-sized agg. Returns a 1-row
    frame (est_join_rows)."""
    prod = (
        cms_a.alias("a")
        .join(cms_b.alias("b"), ["d", "wi"])
        .groupBy("d")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    return prod.groupBy().agg(F.min("ip").alias("est_join_rows"))


# ---------------------------------------------------------------------------
# HyperLogLog (deterministic, scaled-integer) — mergeable NDV registers
# ---------------------------------------------------------------------------

def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """HLL register table per group: (group..., register, rho) with
    register = h % 2^p and rho = leading-zero count of the remaining
    60-p hash bits + 1 (Flajolet et al. 2007). rho is computed WITHOUT
    floating log: rho = (61-p) - length(binary(w)), via conv(w, 10, 2)
    (DuckDB: ltrim(bin(w),'0')) — exact integer arithmetic both
    engines. One map-side-combined groupBy(group, register).max(rho);
    registers MERGE across shards/groups by a further max — which is
    EXACT (merged registers equal the direct build, asserted by test
    and oracle), the property KMV shares but approx_count_distinct's
    opaque binary sketch can't prove cross-engine."""
    m = 1 << p
    groups = list(group_cols)
    h = kmv_hash(value_col)
    # top 60-p bits via an exact integer shift — h/m in double arithmetic
    # would round the 60-bit hash to 53 bits before truncating
    w = F.shiftright(h, p)
    nbits = F.when(w == 0, F.lit(0)).otherwise(F.length(F.conv(w, 10, 2)))
    rho = (F.lit(61 - p) - nbits).cast("int")
    return (
        df.select(*groups, (h % m).alias("register"), rho.alias("rho"))
        .groupBy(*groups, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge register tables (drop finer grouping / union shards):
    groupBy(register).max(rho)."""
    groups = list(group_cols)
    return registers.groupBy(*groups, "register").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Raw HLL estimate per group from a register table, in EXACT
    arithmetic up to one final double division: S = Σ 2^(61-rho) over
    all 2^p registers (absent register ⇒ rho 0 ⇒ term 2^61), summed as
    DECIMAL(38,0), then est = alpha_m · m² · 2^61 / S with alpha_m the
    standard 0.7213/(1+1.079/m) constant — the same literal expression
    in the DuckDB oracle, so the estimate is bit-reproducible. Emits
    (est_ndv, observed_registers); callers needing the small-range
    linear-counting branch should pick p so the raw regime holds
    (observed ≈ m), keeping ln() out of the cross-engine contract."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    groups = list(group_cols)
    agg = registers.groupBy(*groups).agg(
        F.sum(
            _pow2_long(F.lit(61) - F.col("rho"), 61).cast("decimal(38,0)")
        ).alias("__s_obs"),
        F.count(F.lit(1)).alias("observed_registers"),
    )
    two61 = F.lit(1 << 61).cast("decimal(38,0)")
    s_all = (
        F.col("__s_obs")
        + (F.lit(m) - F.col("observed_registers")).cast("decimal(38,0)") * two61
    )
    est = (
        F.lit(float(alpha) * m * m)
        * F.lit(float(1 << 61))
        / s_all.cast("double")
    )
    return agg.select(
        *groups, est.alias("est_ndv"), F.col("observed_registers")
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (bottom-k uniform row sample)
# ---------------------------------------------------------------------------


def _bottom_t_rows(rows: DataFrame, groups: list[str], t: int) -> DataFrame:
    """Rows with the t smallest ``__h`` per group, ``__val`` tiebreak
    (fully deterministic row set even under 60-bit hash collisions).
    Same two-phase shape as :func:`_k_smallest`: ungrouped inputs
    pre-reduce per input partition so the final window sees at most
    ``num_partitions * t`` rows instead of the whole stream."""
    order = [F.col("__h").asc(), F.col("__val").asc()]
    if not groups:
        local_w = Window.partitionBy("__pid").orderBy(*order)
        rows = (
            rows.withColumn("__pid", F.spark_partition_id())
            .withColumn("__lrn", F.row_number().over(local_w))
            .filter(F.col("__lrn") <= t)
            .drop("__pid", "__lrn")
        )
    w = Window.partitionBy(
        *[F.col(g) for g in groups] or [F.lit(1)]
    ).orderBy(*order)
    return (
        rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= t)
        .drop("__rn")
    )


def quantile_sketch_build(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: Sequence[str] = (),
    t: int = 256,
) -> DataFrame:
    """Mergeable bottom-k QUANTILE sketch (Cohen & Kaplan 2007's
    bottom-k row sample): hash each row's UNIQUE id to a uniform
    60-bit md5 value and keep the t rows with the smallest hashes per
    group, carrying the value column — a uniform t-row sample whose
    membership is a pure function of the ids, so it is bit-identical
    across engines/partitionings AND mergeable (union two sketches,
    re-take the bottom t: the global bottom-t of a union is the
    bottom-t of the per-shard bottom-t's). Rank error of a quantile
    read off the sample is O(1/sqrt(t)) with high probability.

    This is the deterministic counterpart of Spark's GK
    ``percentile_approx`` the way KMV is of HyperLogLog++: a slightly
    worse space/accuracy curve bought back as cross-engine
    replayability (q212 value-checks build+merge+query against DuckDB;
    engine-internal sketches can never have that oracle — q52).

    ``id_col`` MUST be unique per row — the sample is keyed by it
    (duplicated ids would under-sample their rows; the doc-id contract
    every persisted index in this engine already requires).

    Output: group cols + (h, value) rows, ≤ t per group. Persist per
    shard/day; roll up with :func:`quantile_sketch_merge`; read
    quantiles with :func:`quantile_sketch_query`.
    """
    if t < 1:
        raise ValueError(f"quantile_sketch_build: t must be >= 1, got {t}")
    groups = list(group_cols)
    rows = df.select(
        *groups,
        kmv_hash(F.col(id_col)).alias("__h"),
        F.col(value_col).cast("double").alias("__val"),
    )
    kept = _bottom_t_rows(rows, groups, t)
    return kept.select(
        *groups, F.col("__h").alias("h"), F.col("__val").alias("value")
    )


def quantile_sketch_merge(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
    t: int = 256,
) -> DataFrame:
    """Merge unioned per-shard sketches (same schema as
    :func:`quantile_sketch_build` output) into one sketch per group:
    keep the t smallest hashes of the union. Associative and
    commutative — per-shard sketches roll up in any order to exactly
    the sketch of the concatenated data (q212's oracle replays the
    single-pass build against the Spark-side two-shard merge)."""
    groups = list(group_cols)
    rows = sketches.select(
        *groups, F.col("h").alias("__h"), F.col("value").alias("__val")
    )
    kept = _bottom_t_rows(rows, groups, t)
    return kept.select(
        *groups, F.col("__h").alias("h"), F.col("__val").alias("value")
    )


def quantile_sketch_query(
    sketch: DataFrame,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Read quantiles off the sample: per group, the sorted sample's
    nearest-rank element — idx = (q_milli·(m−1) + 500) DIV 1000 on the
    0-based sorted values, ALL-INTEGER index arithmetic (quantiles are
    taken in milli-units so no float rounding can differ across
    engines). Returns (group cols..., q_milli, sample_m, q_value).
    """
    if not qs:
        raise ValueError("quantile_sketch_query: qs is empty")
    millis = sorted({int(round(q * 1000)) for q in qs})
    if any(m < 0 or m > 1000 for m in millis):
        raise ValueError(
            f"quantile_sketch_query: quantiles must be in [0, 1], got {qs}"
        )
    groups = list(group_cols)
    agg = sketch.groupBy(*groups).agg(
        F.array_sort(F.collect_list(F.col("value"))).alias("__vals"),
        F.count(F.lit(1)).alias("sample_m"),
    )
    exploded = agg.select(
        *groups,
        "__vals",
        "sample_m",
        F.explode(
            F.array(*[F.lit(m).cast("long") for m in millis])
        ).alias("q_milli"),
    )
    idx = F.expr("(q_milli * (sample_m - 1) + 500) DIV 1000")
    return exploded.select(
        *groups,
        "q_milli",
        "sample_m",
        F.element_at(F.col("__vals"), (idx + 1).cast("int")).alias(
            "q_value"
        ),
    )
