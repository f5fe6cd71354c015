"""Exact edit-distance self-join via segment pigeonholing (PassJoin —
Li, Deng, Wang, Feng, VLDB 2011): all record pairs whose strings are
within Levenshtein distance ``d``, WITHOUT the quadratic pair space.

The lossless counterpart of :mod:`..dedup.entity`'s
``sorted_neighborhood_pairs`` (whose window blocking can miss pairs):
split every string into d+1 contiguous segments — at most d edit
operations can touch at most d segments, so for any pair within
distance d at least one segment of EITHER string appears *verbatim* in
the other, shifted by at most d positions (pigeonhole). Indexing the
segments and probing with position-bounded substrings therefore finds
every qualifying pair; an exact integer ``levenshtein`` verify removes
false candidates.

Scale shape (the same collapse-then-join discipline as
``set_similarity_join``): records collapse to DISTINCT-value classes
first (one shuffle — duplicate-heavy corpora cost their distinct
structure, not their row count), the segment index/probe equi-join
runs over class representatives only, and qualifying value pairs
expand back to record pairs linearly in the TRUE output size.
Candidate volume is bounded by segment-key collisions; degenerate
shared segments can be capped with ``max_segment_bucket`` (the LSH
mega-bucket-guard pattern — documented lossy escape hatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import ensure_parallelism


def _seg_start(i, base, k_minus_rem):
    # 0-based start of segment i: first (k-rem) segments have length
    # `base`, the last rem have base+1
    return i * base + F.greatest(i - k_minus_rem, F.lit(0))


def _seg_len(i, base, k_minus_rem):
    return base + F.when(i >= k_minus_rem, F.lit(1)).otherwise(F.lit(0))


def levenshtein_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    d: int = 2,
    max_segment_bucket: int | None = None,
    max_short_values: int = 100_000,
    return_candidates: bool = False,
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(text_a, text_b) <= d.
    Returns (id_a, id_b, dist) — exact integer distances, so results
    replay bit-identically from a brute-force oracle.

    Pipeline: (1) collapse identical strings into classes (class id =
    min record id); (2) index each distinct value of length >= d+1 by
    its d+1 segments, probe every value with all substrings matching a
    segment's length at starts within +/-d of its position, for every
    plausible partner length (|len diff| <= d) — the PassJoin
    candidate set; (3) verify candidates with one ``levenshtein``
    call; (4) expand value pairs to record pairs and add intra-class
    pairs (distance 0) generated row-locally.

    Values shorter than d+1 cannot be segmented (a zero-length segment
    key would match everywhere); the short-value block is joined
    all-pairs among itself — its value space is at most
    |alphabet|^d and is guarded by ``max_short_values``. Short-long
    pairs are still found losslessly through the long side's index.
    """
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    k = d + 1
    recs = (
        ensure_parallelism(df)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("rid"), F.col(text_col).alias("val"))
    )
    classes = recs.groupBy("val").agg(
        F.min("rid").alias("cid"), F.count(F.lit(1)).alias("csize")
    )

    vals = classes.select("val", F.length("val").alias("l"))
    long_vals = vals.filter(F.col("l") >= k)

    base = (F.col("l") / k).cast("int")
    rem = F.col("l") % k
    kmr = F.lit(k) - rem  # segments [kmr, k) get length base+1

    # ---- index side: (l, i, segment) per distinct long value
    idx_entries = F.transform(
        F.sequence(F.lit(0), F.lit(d)),
        lambda i: F.struct(
            i.alias("i"),
            F.col("val")
            .substr(
                _seg_start(i, base, kmr) + 1, _seg_len(i, base, kmr)
            )
            .alias("seg"),
        ),
    )
    index = long_vals.select(
        F.col("val").alias("val_a"),
        F.col("l").alias("la"),
        F.explode(idx_entries).alias("__e"),
    ).select("val_a", F.col("la").alias("l"), "__e.i", "__e.seg")
    if max_segment_bucket is not None:
        heavy = (
            index.groupBy("l", "i", "seg")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_segment_bucket)
            .select("l", "i", "seg")
        )
        index = index.join(heavy, ["l", "i", "seg"], "left_anti")

    # ---- probe side: for each value, every (partner length, segment,
    # shifted substring) that could witness a match
    m = F.col("l")
    probe_entries = F.flatten(
        F.transform(
            F.sequence(F.greatest(m - d, F.lit(k)), m + d),
            lambda pl: F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(d)),
                    lambda i: F.filter(
                        F.transform(
                            F.sequence(F.lit(-d), F.lit(d)),
                            lambda sh: F.struct(
                                pl.alias("pl"),
                                i.alias("i"),
                                (
                                    _seg_start(
                                        i,
                                        (pl / k).cast("int"),
                                        F.lit(k) - pl % k,
                                    )
                                    + sh
                                ).alias("st"),
                                _seg_len(
                                    i,
                                    (pl / k).cast("int"),
                                    F.lit(k) - pl % k,
                                ).alias("ln"),
                            ),
                        ),
                        lambda s: (s["st"] >= 0)
                        & (s["st"] + s["ln"] <= m),
                    ),
                )
            ),
        )
    )
    probes = (
        vals.select(
            F.col("val").alias("val_b"),
            F.explode(
                F.array_distinct(
                    F.transform(
                        probe_entries,
                        lambda s: F.struct(
                            s["pl"].alias("l"),
                            s["i"].alias("i"),
                            F.col("val")
                            .substr(s["st"] + 1, s["ln"])
                            .alias("seg"),
                        ),
                    )
                )
            ).alias("__p"),
        )
        .select("val_b", "__p.l", "__p.i", "__p.seg")
    )

    cand = (
        index.join(probes, ["l", "i", "seg"])
        .filter(F.col("val_a") != F.col("val_b"))
        .select(
            F.least("val_a", "val_b").alias("va"),
            F.greatest("val_a", "val_b").alias("vb"),
        )
        .distinct()
    )

    # ---- short-short block: both values unsegmentable (length < k).
    # The guard probes a CAPPED count (limit k+1) instead of a full
    # count — one bounded scan that stops at the limit, not a whole
    # extra job over the distinct values at scale.
    shorts = vals.filter(F.col("l") < k)
    n_short = shorts.limit(max_short_values + 1).count()
    if n_short > max_short_values:
        raise ValueError(
            f"more than max_short_values={max_short_values} distinct "
            f"values shorter than d+1={k}"
        )
    if n_short > 1:
        # disjoint from the segment candidates (those always involve a
        # long value on the index side), so no re-distinct needed
        sa = shorts.select(F.col("val").alias("va"))
        sb = shorts.select(F.col("val").alias("vb"))
        cand = cand.unionByName(
            sa.crossJoin(sb).filter(F.col("va") < F.col("vb"))
        )

    if return_candidates:
        # counted-work probe (scale_check pair_ratio): the PassJoin
        # candidate value-pair stream before the levenshtein verify
        return cand
    verified = cand.withColumn(
        "dist", F.levenshtein("va", "vb")
    ).filter(F.col("dist") <= d)

    # ---- expand to record pairs
    ma = classes.select(F.col("val").alias("va"), F.col("cid").alias("__ca"))
    mb = classes.select(F.col("val").alias("vb"), F.col("cid").alias("__cb"))
    mem_a = recs.select(F.col("val").alias("va"), F.col("rid").alias("ra"))
    mem_b = recs.select(F.col("val").alias("vb"), F.col("rid").alias("rb"))
    cross = (
        verified.join(mem_a, "va")
        .join(mem_b, "vb")
        .select(
            F.least("ra", "rb").alias("id_a"),
            F.greatest("ra", "rb").alias("id_b"),
            "dist",
        )
    )
    intra = (
        recs.groupBy("val")
        .agg(F.sort_array(F.collect_list("rid")).alias("__ids"))
        .filter(F.size("__ids") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.slice(
                            "__ids",
                            1,
                            F.greatest(F.size("__ids") - 1, F.lit(0)),
                        ),
                        lambda x, i: F.transform(
                            F.slice(F.col("__ids"), i + 2, F.size("__ids")),
                            lambda y: F.struct(
                                x.alias("id_a"), y.alias("id_b")
                            ),
                        ),
                    )
                )
            ).alias("__p")
        )
        .select("__p.id_a", "__p.id_b", F.lit(0).alias("dist"))
    )
    return cross.unionByName(intra)
