"""MinHash + LSH near-duplicate detection, fully declarative.

Pipeline: word-shingles → k MinHash values → band signatures →
bucket-join on (band, signature) → candidate pairs → (optional) exact
Jaccard verification on candidates only.

Design choices for scale AND cross-engine determinism:
- MinHash_i(doc) = MIN over shingles of md5(i || "|" || shingle),
  compared as *hex strings*. md5 is identical everywhere (so the DuckDB
  oracle can replicate bit-for-bit), and lexicographic min over a
  uniformly-distributed hex digest is a valid minwise permutation.
- All array ops are higher-order functions (transform/filter/aggregate)
  — no Python in the pipeline.
- The bucket-join shuffles only (band_key, doc_id); the O(n²) pair space
  is never materialized — only same-bucket collisions are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ngram import word_shingles


def shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles of whitespace-tokenized text (distinct)."""
    return word_shingles(col, n)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig) where sig = array of num_hashes hex-string minima.
    Documents with fewer than one shingle get no signature (dropped)."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    sh = shingles(text_col, shingle_n)

    # ONE fold over the shingle array computes all k minima: per shingle
    # build its k md5 candidates, zip_with(least) into the accumulator.
    # (k separate array_min(transform(...)) expressions would make
    # CollapseProject inline — and re-evaluate — the shingle expression
    # k times; measured ~1.6x slower at sf0.1.)
    def _merge(acc, s):
        candidates = F.array(
            *[F.md5(F.concat(F.lit(f"{i}|"), s)) for i in range(num_hashes)]
        )
        return F.zip_with(acc, candidates, lambda a, b: F.least(a, b))

    # 'g' sorts after every md5 hex digest ('g' > 'f'), so it is the
    # identity for lexicographic min
    init = F.array_repeat(F.lit("g"), num_hashes)
    sigs = F.aggregate(F.col("__sh"), init, _merge)
    return (
        df.select(F.col(id_col), sh.alias("__sh"))
        .filter(F.size("__sh") > 0)
        .select(F.col(id_col), sigs.alias("sig"))
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
) -> DataFrame:
    """Band the signature (rows = num_hashes / bands), bucket-join on the
    band key, emit distinct candidate (a, b) pairs with a < b."""
    # band b covers sig[b*r+1 .. (b+1)*r]; r computed from size at runtime
    r = F.floor(F.size("sig") / F.lit(bands)).cast("int")
    banded = sig_df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.array_join(F.slice(F.col("sig"), b * r + 1, r), "|")
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bucket")
    # The self-join below reads this twice; a lazy cache() races when
    # both sides compute in the same job, so materialize eagerly. The
    # (id, band, bucket) projection is tiny relative to the md5 work
    # that produces it. At 100 TB this is the stage you persist as a
    # signatures table instead.
    banded = banded.localCheckpoint(eager=True)
    left = banded.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("a")
    )
    right = banded.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("b")
    )
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float | None = 0.7,
) -> DataFrame:
    """Near-dup dedup: LSH candidates (optionally verified by exact
    shingle Jaccard) → connected "keep the smallest id per duplicate
    pair-group" rule → surviving rows.

    Note: survivor selection collapses pairs by min-id per component
    *approximated* as min over direct neighbors (single pass). For full
    transitive closure use graph.connected_components on the pair list.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    pairs = lsh_candidate_pairs(sigs, id_col, bands)
    if jaccard_threshold is not None:
        from .ngram import ngram_jaccard_on_pairs

        pairs = ngram_jaccard_on_pairs(
            pairs, df, text_col, id_col, shingle_n
        ).filter(F.col("jaccard") >= jaccard_threshold).select("a", "b")
    # every doc appearing as the larger id of a pair is a duplicate
    losers = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
