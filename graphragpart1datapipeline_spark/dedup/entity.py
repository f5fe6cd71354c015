"""Entity resolution: exact set-similarity self-join (prefix filtering)
and sorted-neighborhood pairing.

These are the EXACT counterparts of the probabilistic candidate
generators elsewhere in ``dedup/`` (MinHash LSH, SimHash, hyperplane
buckets): every qualifying pair is guaranteed to be found.

- :func:`set_similarity_join` — all record pairs with token-set Jaccard
  >= t, via the prefix-filtering principle (Chaudhuri et al. 2006,
  Bayardo et al. WWW'07 / PPJoin family): under ANY global token order,
  two sets with overlap >= a must share a token within the first
  |x| - a + 1 tokens of each. With the length filter |y| >= t|x|, the
  required overlap is >= ceil(t*|r|) for BOTH records, so indexing only
  each record's (|r| - ceil(t|r|) + 1)-token prefix is lossless. Rare
  tokens are ordered first (ascending document frequency), which makes
  prefixes maximally selective — candidate volume approaches the true
  result size instead of the quadratic pair space.
- :func:`global_rank` — distributed dense global row numbering by an
  arbitrary sort key WITHOUT a single-partition window: bucket by a key
  prefix, rank within buckets, then shift by cumulative bucket counts
  (a window over the tiny bucket-count table only).
- :func:`sorted_neighborhood_pairs` — the classic merge/purge blocking
  (Hernandez & Stolfo 1995): sort by a fuzzy key, compare each record
  with its next ``window`` neighbors only, verify with Levenshtein.
  Pairing is an equi-join on rank blocks (each right row is offered to
  its own block and the previous one), never a theta join.

Jaccard thresholds are rational (``t_num/t_den``) and every comparison
is integer arithmetic, so results are bit-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _token_set(col):
    """lower → split on non-alphanumeric → distinct, empties removed."""
    return F.array_distinct(
        F.filter(
            F.split(F.lower(col), "[^a-z0-9]+"),
            lambda t: t != F.lit(""),
        )
    )


def set_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    t_num: int = 3,
    t_den: int = 5,
) -> DataFrame:
    """All pairs (a, b), a < b by id, with Jaccard(tokens(a), tokens(b))
    >= t_num/t_den. Returns (id_a, id_b, inter_size, union_size).

    Plan shape (all sizes integer-exact):
      1. tokenize + per-record distinct token arrays       (map-only)
      2. token document frequencies                        (1 shuffle)
      3. re-order each record's tokens rarest-first        (explode +
         join token→(df,token) rank, re-collect)           (1 shuffle)
      4. explode only the prefix (|r| - ceil(t|r|) + 1),
         self-join on the prefix token                     (1 shuffle)
      5. verify Jaccard on the full arrays, integer math   (map-only)

    The prefix join key is the natural partition key: a hot token means
    a hot bucket, and because tokens are ordered by ascending frequency
    the prefix preferentially holds RARE tokens — the frequent-token
    mega-buckets LSH has to guard against mostly never form. ceil is
    computed as floor((t_num*n + t_den - 1)/t_den) — pure integers.
    """
    recs = df.select(
        F.col(id_col).alias("rid"), _token_set(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)

    # Global rarest-first order: (doc-frequency, token) ascending.
    tok_df = (
        recs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tok_df"))
    )
    ordered = (
        recs.select("rid", F.explode("toks").alias("tok"))
        .join(tok_df, "tok")
        .groupBy("rid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("tok_df", "tok"))
            ).alias("ordered_pairs")
        )
        .select(
            "rid",
            F.transform(F.col("ordered_pairs"), lambda s: s["tok"]).alias("toks"),
        )
    )
    sized = ordered.withColumn("sz", F.size("toks")).withColumn(
        "prefix_len",
        F.col("sz")
        - F.floor((F.lit(t_num) * F.col("sz") + F.lit(t_den - 1)) / F.lit(t_den)).cast(
            "int"
        )
        + F.lit(1),
    )
    prefix = sized.select(
        "rid",
        "toks",
        "sz",
        F.explode(F.slice("toks", 1, F.col("prefix_len"))).alias("ptok"),
    )
    left = prefix.select(
        F.col("rid").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("sz").alias("sz_a"),
        "ptok",
    )
    right = prefix.select(
        F.col("rid").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("sz").alias("sz_b"),
        "ptok",
    )
    cand = (
        left.join(right, "ptok")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: t*max <= min  <=>  t_num*max <= t_den*min
        .filter(
            F.lit(t_num) * F.greatest("sz_a", "sz_b")
            <= F.lit(t_den) * F.least("sz_a", "sz_b")
        )
        .select("id_a", "id_b", "toks_a", "toks_b", "sz_a", "sz_b")
        .distinct()
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    verified = (
        cand.withColumn("inter_size", inter)
        .withColumn(
            "union_size", F.col("sz_a") + F.col("sz_b") - F.col("inter_size")
        )
        # Jaccard >= t  <=>  t_den * inter >= t_num * union   (integers)
        .filter(
            F.lit(t_den) * F.col("inter_size") >= F.lit(t_num) * F.col("union_size")
        )
        .select("id_a", "id_b", "inter_size", "union_size")
    )
    return verified


def global_rank(
    df: DataFrame,
    key_cols: list[str],
    rank_col: str = "rn",
    bucket_expr=None,
) -> DataFrame:
    """Dense global 0-based rank by ``key_cols`` without a
    single-partition window.

    ``bucket_expr`` must be a monotone function of the leading sort key
    (default: first character of the first key column). Rows are ranked
    within buckets (one hash exchange), bucket row-counts — a frame with
    ONE ROW PER BUCKET — get cumulative offsets via a driver-trivial
    window, and the offset is broadcast-joined back. For skewed key
    distributions pass a finer ``bucket_expr`` (longer prefix, or
    precomputed range-quantile ids).
    """
    b = (
        bucket_expr
        if bucket_expr is not None
        else F.substring(F.col(key_cols[0]).cast("string"), 1, 1)
    )
    with_b = df.withColumn("__bkt", b)
    local_w = Window.partitionBy("__bkt").orderBy(
        *[F.col(c) for c in key_cols]
    )
    local = with_b.withColumn(
        "__lrn", F.row_number().over(local_w).cast("long") - 1
    )
    counts = with_b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    off_w = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).cast("long")
    ).select("__bkt", "__off")
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(rank_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__bkt", "__lrn", "__off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 5,
    max_distance: int = 2,
    bucket_expr=None,
) -> DataFrame:
    """Merge/purge candidate pairs: records within ``window`` positions
    of each other in ``key_col`` sort order whose keys are within
    Levenshtein ``max_distance``. Returns
    (id_a, id_b, key_a, key_b, rank_gap, edit_distance), a < b in rank.

    Pairing is rank-block equi-join: block = floor(rn/window); a pair
    with 1 <= gap <= window always lands in the same or adjacent
    blocks, so each right row is offered under its own block and the
    previous one — 2 join rows per record, never a cross product.
    """
    ranked = global_rank(
        df.select(F.col(id_col).alias("rid"), F.col(key_col).alias("key")),
        ["key", "rid"],
        rank_col="rn",
        bucket_expr=bucket_expr,
    )
    blk = (F.col("rn") / window).cast("long")
    left = ranked.select(
        F.col("rid").alias("id_a"),
        F.col("key").alias("key_a"),
        F.col("rn").alias("rn_a"),
        blk.alias("blk"),
    )
    right = ranked.select(
        F.col("rid").alias("id_b"),
        F.col("key").alias("key_b"),
        F.col("rn").alias("rn_b"),
        F.explode(F.array(blk, blk - 1)).alias("blk"),
    )
    return (
        left.join(right, "blk")
        .withColumn("rank_gap", F.col("rn_b") - F.col("rn_a"))
        .filter((F.col("rank_gap") >= 1) & (F.col("rank_gap") <= window))
        .withColumn("edit_distance", F.levenshtein("key_a", "key_b"))
        .filter(F.col("edit_distance") <= max_distance)
        .select("id_a", "id_b", "key_a", "key_b", "rank_gap", "edit_distance")
    )
