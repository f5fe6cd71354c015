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

from ..util import ensure_parallelism


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
    max_token_bucket: int | None = None,
    return_candidates: bool = False,
) -> DataFrame:
    """All pairs (a, b), a < b by id, with Jaccard(tokens(a), tokens(b))
    >= t_num/t_den. Returns (id_a, id_b, inter_size, union_size).

    Two-level plan — collapse-then-join — so duplicate-heavy corpora
    cost what their DISTINCT structure costs, not their row count:

      1. tokenize, canonicalize (sorted distinct token array), and
         group records into identical-set CLASSES (one shuffle; class
         id = min record id). On q122's part table this is 20k rows ->
         ~6k classes; on a diverse corpus it is a near-no-op.
      2. prefix-filter join over class REPRESENTATIVES only
         (Chaudhuri/Bayardo/PPJoin): rarest-first global token order,
         each class indexed by its (|r| - ceil(t|r|) + 1)-token prefix,
         equi-join on prefix tokens, arrays re-attached for the
         integer-exact Jaccard verify, and the SURVIVORS distinct-ed
         (far cheaper than distinct-ing the raw candidate stream).
      3. expand back to record pairs: qualifying class pairs join the
         membership table twice (cross pairs), plus all intra-class
         pairs (Jaccard 1 by construction) — both linear in the TRUE
         output size.

    Losslessness: identical sets always qualify (J=1 >= t); distinct
    sets qualify iff their class representatives qualify, and the
    prefix principle over ANY global token order guarantees reps with
    overlap >= ceil(t*|r|) collide in their prefixes. The q122 oracle
    (brute-force quadratic join) and the adversarial unit test pin it.

    ``max_token_bucket`` (opt-in) drops prefix tokens whose CLASS
    bucket exceeds the cap — the escape hatch when even the distinct
    structure is quadratic (every class sharing the same few
    non-discriminative tokens); pairs blocked only by such tokens are
    then missed, documented trade."""
    if not (0 < t_num <= t_den):
        raise ValueError(
            f"threshold t_num/t_den must be in (0, 1]: got {t_num}/{t_den}"
        )
    recs = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("rid"),
            F.array_sort(_token_set(F.col(text_col))).alias("ctoks"),
        )
        .filter(F.size("ctoks") > 0)
    )
    classes = recs.groupBy("ctoks").agg(F.min("rid").alias("cid"))
    members = recs.join(classes, "ctoks").select("rid", "cid")
    reps = classes.select("cid", F.explode("ctoks").alias("tok"))

    # Global rarest-first order over CLASS document frequencies.
    tok_df = reps.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_df"))
    ordered = (
        reps.join(tok_df, "tok")
        .groupBy("cid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("tok_df", "tok"))
            ).alias("ordered_pairs")
        )
        .select(
            "cid",
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
        "cid",
        "sz",
        F.explode(F.slice("toks", 1, F.col("prefix_len"))).alias("ptok"),
    )
    if max_token_bucket is not None:
        keep = (
            prefix.groupBy("ptok")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_token_bucket)
            .select("ptok")
        )
        prefix = prefix.join(keep, "ptok")
    left = prefix.select(
        F.col("cid").alias("ca"), F.col("sz").alias("sz_a"), "ptok"
    )
    right = prefix.select(
        F.col("cid").alias("cb"), F.col("sz").alias("sz_b"), "ptok"
    )
    cand_ids = (
        left.join(right, "ptok")
        .filter(F.col("ca") < F.col("cb"))
        # length filter: t*max <= min  <=>  t_num*max <= t_den*min
        .filter(
            F.lit(t_num) * F.greatest("sz_a", "sz_b")
            <= F.lit(t_den) * F.least("sz_a", "sz_b")
        )
        .select("ca", "cb")
    )
    if return_candidates:
        # counted-work probe (scale_check pair_ratio): the candidate
        # CLASS-pair stream before the Jaccard verify — the quantity
        # whose growth rate proves/disproves pair-space linearity,
        # deterministic at fixed data (unlike wall clock)
        return cand_ids
    toks_a = sized.select(
        F.col("cid").alias("ca"),
        F.col("toks").alias("toks_a"),
        F.col("sz").alias("sz_a"),
    )
    toks_b = sized.select(
        F.col("cid").alias("cb"),
        F.col("toks").alias("toks_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    class_pairs = (
        cand_ids.join(toks_a, "ca")
        .join(toks_b, "cb")
        .withColumn("inter_size", inter)
        .withColumn(
            "union_size", F.col("sz_a") + F.col("sz_b") - F.col("inter_size")
        )
        # Jaccard >= t  <=>  t_den * inter >= t_num * union   (integers)
        .filter(
            F.lit(t_den) * F.col("inter_size") >= F.lit(t_num) * F.col("union_size")
        )
        .select("ca", "cb", "inter_size", "union_size")
        # dedup AFTER the verify: survivors are ~the true pair count,
        # orders of magnitude below the raw candidate stream on dense
        # inputs — distinct-ing first would shuffle the full stream.
        .distinct()
    )
    # Expansion: cross-class record pairs (reorder so id_a < id_b; the
    # pair metrics are orientation-independent) ...
    ma = members.select(F.col("cid").alias("ca"), F.col("rid").alias("ra"))
    mb = members.select(F.col("cid").alias("cb"), F.col("rid").alias("rb"))
    cross = (
        class_pairs.join(ma, "ca")
        .join(mb, "cb")
        .select(
            F.least("ra", "rb").alias("id_a"),
            F.greatest("ra", "rb").alias("id_b"),
            "inter_size",
            "union_size",
        )
    )
    # ... plus intra-class pairs (identical sets, Jaccard exactly 1).
    sz_by_class = sized.select("cid", "sz")
    intra = (
        members.alias("x")
        .join(members.alias("y"), "cid")
        .filter(F.col("x.rid") < F.col("y.rid"))
        .join(sz_by_class, "cid")
        .select(
            F.col("x.rid").alias("id_a"),
            F.col("y.rid").alias("id_b"),
            F.col("sz").alias("inter_size"),
            F.col("sz").alias("union_size"),
        )
    )
    return cross.unionByName(intra)


def global_rank(
    df: DataFrame,
    key_cols: list[str],
    rank_col: str = "rn",
    bucket_expr=None,
) -> DataFrame:
    """Dense global 0-based rank by ``key_cols`` without a
    single-partition window.

    ``bucket_expr`` must be a monotone function of the leading sort key
    (default: first character of the first key column — valid ONLY for
    string keys, so a non-string leading key without an explicit
    ``bucket_expr`` raises rather than silently mis-ranking: '10' < '9'
    lexically). Rows are ranked within buckets (one hash exchange),
    bucket row-counts — a frame with ONE ROW PER BUCKET — get cumulative
    offsets via a driver-trivial window, and the offset is
    broadcast-joined back. For numeric keys pass a range bucket (e.g.
    ``F.floor(F.col(k) / step)``); for skewed key distributions pass a
    finer ``bucket_expr`` (longer prefix, or precomputed range-quantile
    ids).
    """
    if bucket_expr is None:
        lead_type = dict(df.dtypes).get(key_cols[0])
        if lead_type != "string":
            raise ValueError(
                f"global_rank: default bucket_expr (first character) is "
                f"only monotone for string keys; leading key "
                f"{key_cols[0]!r} is {lead_type} — pass a monotone "
                f"bucket_expr such as F.floor(F.col({key_cols[0]!r}) / step)"
            )
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

    ``bucket_expr`` (forwarded to :func:`global_rank`) is evaluated on
    the internal (key, rid) projection — reference ``F.col("key")``.

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


def containment_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    t_num: int = 1,
    t_den: int = 2,
    max_token_bucket: int | None = None,
) -> DataFrame:
    """DIRECTIONAL containment self-join: all ordered pairs (a, b),
    a != b, with C(A→B) = |A ∩ B| / |A| >= t_num/t_den over the
    precomputed token-array column ``tokens_col`` (pass word sets for
    vocabulary containment, n-gram shingles for passage/quote
    containment — the asymmetric complement of
    :func:`set_similarity_join`'s Jaccard: a short document fully
    quoted inside a long one scores containment 1 while its Jaccard
    vanishes). Returns (id_a, id_b, inter_size, a_size) where id_a is
    the contained side.

    Same collapse-then-join shape as :func:`set_similarity_join`:
    identical-set classes first, then candidates from the prefix
    principle — if |A ∩ B| >= o = ceil(t·|A|), A's rarest-first prefix
    of |A| − o + 1 tokens must hit SOME token of B, so indexing A's
    prefixes and probing with B's FULL token lists is lossless (the
    probe side cannot be prefix-truncated: the overlap bound depends
    on A alone). Verify is exact integer arithmetic
    (t_den·inter >= t_num·|A|); expansion is linear in the true output.
    ``max_token_bucket`` caps degenerate prefix-token buckets (lossy,
    the LSH mega-bucket-guard pattern)."""
    if not (0 < t_num <= t_den):
        raise ValueError(
            f"threshold t_num/t_den must be in (0, 1]: got {t_num}/{t_den}"
        )
    recs = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("rid"),
            F.array_sort(F.array_distinct(F.col(tokens_col))).alias("ctoks"),
        )
        .filter(F.size("ctoks") > 0)
    )
    classes = recs.groupBy("ctoks").agg(F.min("rid").alias("cid"))
    members = recs.join(classes, "ctoks").select("rid", "cid")
    reps = classes.select("cid", F.explode("ctoks").alias("tok"))
    tok_df = reps.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_df"))
    ordered = (
        reps.join(tok_df, "tok")
        .groupBy("cid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("tok_df", "tok"))
            ).alias("ordered_pairs")
        )
        .select(
            "cid",
            F.transform(F.col("ordered_pairs"), lambda s: s["tok"]).alias(
                "toks"
            ),
        )
    )
    # o = ceil(t * sz); prefix covers the first sz - o + 1 rarest tokens
    sized = ordered.withColumn("sz", F.size("toks")).withColumn(
        "prefix_len",
        F.col("sz")
        - F.floor(
            (F.lit(t_num) * F.col("sz") + F.lit(t_den - 1)) / F.lit(t_den)
        ).cast("int")
        + F.lit(1),
    )
    prefix = sized.select(
        F.col("cid").alias("ca"),
        F.col("sz").alias("sz_a"),
        F.explode(F.slice("toks", 1, F.col("prefix_len"))).alias("tok"),
    )
    if max_token_bucket is not None:
        keep = (
            prefix.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_token_bucket)
            .select("tok")
        )
        prefix = prefix.join(keep, "tok")
    probe = sized.select(
        F.col("cid").alias("cb"),
        F.col("sz").alias("sz_b"),
        F.explode("toks").alias("tok"),
    )
    cand_ids = (
        prefix.join(probe, "tok")
        .filter(F.col("ca") != F.col("cb"))
        # |B| must be able to hold the required overlap o(A)
        .filter(F.lit(t_den) * F.col("sz_b") >= F.lit(t_num) * F.col("sz_a"))
        .select("ca", "cb")
    )
    toks_a = sized.select(
        F.col("cid").alias("ca"),
        F.col("toks").alias("toks_a"),
        F.col("sz").alias("sz_a"),
    )
    toks_b = sized.select(
        F.col("cid").alias("cb"), F.col("toks").alias("toks_b")
    )
    class_pairs = (
        cand_ids.join(toks_a, "ca")
        .join(toks_b, "cb")
        .withColumn(
            "inter_size", F.size(F.array_intersect("toks_a", "toks_b"))
        )
        # C(A→B) >= t  ⟺  t_den * inter >= t_num * |A|   (integers)
        .filter(
            F.lit(t_den) * F.col("inter_size") >= F.lit(t_num) * F.col("sz_a")
        )
        .select("ca", "cb", "inter_size", F.col("sz_a").alias("a_size"))
        # dedup AFTER the verify (survivors ≈ true pairs, far below the
        # candidate stream)
        .distinct()
    )
    ma = members.select(F.col("cid").alias("ca"), F.col("rid").alias("ra"))
    mb = members.select(F.col("cid").alias("cb"), F.col("rid").alias("rb"))
    cross = (
        class_pairs.join(ma, "ca")
        .join(mb, "cb")
        .select(
            F.col("ra").alias("id_a"),
            F.col("rb").alias("id_b"),
            "inter_size",
            "a_size",
        )
    )
    sz_by_class = sized.select("cid", "sz")
    intra = (
        members.alias("x")
        .join(members.alias("y"), "cid")
        .filter(F.col("x.rid") != F.col("y.rid"))
        .join(sz_by_class, "cid")
        .select(
            F.col("x.rid").alias("id_a"),
            F.col("y.rid").alias("id_b"),
            F.col("sz").alias("inter_size"),
            F.col("sz").alias("a_size"),
        )
    )
    return cross.unionByName(intra)
