"""Leakage-safe train/val/test splits.

A plain per-document split (hash_split) contaminates evaluation the
moment the corpus contains near-duplicates: doc A lands in train, its
near-copy B in test, and the model is graded on memorization. The fix
is to split by DUPLICATE GROUP, not by document — every document of a
near-dup component travels to the same split.

Composition, all existing scale paths: verified near-dup pairs (any of
the dedup family — MinHash/LSH, SimHash, embedding) → distributed
connected components (large-star/small-star pointer jumping) → each
document keyed by its component root (its own id when it has no
duplicates) → md5-bucket split on the ROOT key (hash_split rule).
Deterministic end to end: the assignment is a pure function of
(pairs, seed), reproducible across engines — q87 value-checks the full
closure + assignment against DuckDB's recursive-CTE replay.

Scale: components is O(log d) join rounds over the PAIR table (tiny
after LSH); the corpus itself sees one left join + a map-only bucket
rule. Growing the corpus never reshuffles existing docs between splits
unless a new duplicate link merges their components — exactly the
semantics an eval-contamination guard needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.communities import connected_components
from ..operators.relational import hash_split


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    seed: str | int = 42,
    src: str = "a",
    dst: str = "b",
    split_col: str = "split",
) -> DataFrame:
    """Assign ``split_col`` so that documents connected by
    ``dup_pairs`` (directly or transitively) always share a split.
    Returns ``docs`` + the split column; the internal root key is
    dropped."""
    comp = connected_components(dup_pairs, src=src, dst=dst).withColumnRenamed(
        "id", id_col
    )
    rooted = docs.join(comp, id_col, "left").withColumn(
        "__root", F.coalesce(F.col("component"), F.col(id_col))
    )
    out = hash_split(
        rooted, "__root", weights=tuple(weights), seed=seed,
        split_col=split_col,
    )
    return out.drop("component", "__root")


def weighted_poisson_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    expected_n: int,
    seed: str | int = 42,
    weight_scale: int = 100,
) -> DataFrame:
    """Deterministic weighted (Poisson / probability-proportional-to-
    size) sample: row i is kept iff u_i < expected_n * w_i / W, where
    u_i is the row's md5-derived uniform and W the total weight. Every
    row is an independent keep/drop decision — map-only over the corpus
    after ONE scalar total-weight aggregation (broadcast as a 1-row
    frame), so the operator has no ordering, no global window, and no
    collect; at 100 TB it is a single scan.

    Rows with w_i >= W/expected_n have probability clamped to 1 by
    construction (u_i < 2^32 <= threshold). E[|sample|] = expected_n
    minus the clamp excess; variance is the Poisson-sampling variance.
    For exact-size samples compose with ``top_n_per_group`` on the keep
    key; for equal weights this degrades to hash_split-style Bernoulli.

    Bit-reproducible: weights are scaled to integers
    (floor(w*scale + 0.5)), u_i = first 8 md5 hex digits (32 bits —
    plenty of resolution for a keep probability, and small enough that
    every product below stays inside DECIMAL(38,0) with NO precision
    loss), and the keep test u*W_int < (n*2^32)*w_int is pure integer
    arithmetic — identical in any engine with md5 (the oracle replays
    it in DuckDB with HUGEINT). Bounds are enforced, never silently
    overflowed: expected_n <= 2*10^8 (so n*2^32 fits DECIMAL(18,0)),
    W = sum(w_int) < 10^27 (checked lazily in-plan via raise_error —
    summed through DECIMAL(28,0) so even the check itself is exact).
    """
    if expected_n > 200_000_000:
        raise ValueError(
            "weighted_poisson_sample: expected_n must be <= 2e8 so the "
            "keep-threshold n*2^32 stays inside decimal(18,0); sample in "
            "strata or raise the bound with a wider decimal budget"
        )
    w_int = F.floor(
        F.col(weight_col).cast("double") * weight_scale + F.lit(0.5)
    ).cast("long")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
    )
    tagged = df.withColumn("__w", w_int).withColumn("__u", u)
    # Sum through decimal(28,0) -> Spark result decimal(38,0): exact for
    # any realistic corpus (w_int is a long, so < 9.3e18 per row). The
    # guard-cast to decimal(27,0) raises instead of returning NULL if
    # W >= 1e27 — evaluated lazily inside the 1-row aggregate, no extra
    # job.
    wtot_raw = F.sum(F.col("__w").cast("decimal(28,0)"))
    total = tagged.groupBy().agg(
        F.when(
            wtot_raw < F.lit(str(10**27)).cast("decimal(38,0)"),
            wtot_raw,
        )
        .otherwise(
            F.raise_error(
                "weighted_poisson_sample: total scaled weight >= 1e27 "
                "overflows the exact decimal budget; lower weight_scale"
            )
        )
        .cast("decimal(27,0)")
        .alias("__wtot")
    )
    # Precision audit (Spark result precision = p1+p2+1, hard cap 38):
    # u:dec(10) * W:dec(27) -> dec(38); (n*2^32):dec(18) * w:dec(19)
    # -> dec(38). All exact, no precision-loss rounding; the Python-side
    # expected_n bound and the in-plan W bound keep every operand in
    # range.
    keep = (
        F.col("__u").cast("decimal(10,0)") * F.col("__wtot")
    ) < (
        F.lit(expected_n * (1 << 32)).cast("decimal(18,0)")
        * F.col("__w").cast("decimal(19,0)")
    )
    return (
        tagged.crossJoin(F.broadcast(total))
        .filter(F.col("__w") > 0)
        .filter(keep)
        .drop("__w", "__u", "__wtot")
    )
