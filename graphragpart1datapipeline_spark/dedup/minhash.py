"""MinHash + LSH near-duplicate detection, fully declarative.

Pipeline: word-shingles → k MinHash values → band signatures →
bucket-join on (band, signature) → candidate pairs → (optional) exact
Jaccard verification on candidates only.

Design choices for scale AND cross-engine determinism:
- ONE base hash per shingle (md5 → first 15 hex digits → 60-bit int,
  reduced mod 2^31-1), then k affine permutations
  h_i = (a_i·h + b_i) mod 2^31-1 — the classic minwise family. One
  cryptographic hash instead of k per shingle; the permutations are a
  few integer ops each. md5 and 64-bit integer arithmetic are identical
  in every engine, so the DuckDB oracle replicates bit-for-bit.
- The signature is an explode → groupBy(id).agg(k × min) plan: the
  explode is narrow (no shuffle), the aggregation partial-combines
  map-side, so the shuffle carries one k-long row per document.
- The bucket-join shuffles only (band_key, doc_id); the O(n²) pair space
  is never materialized — only same-bucket collisions are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ngram import word_shingles

MERSENNE31 = 2_147_483_647  # 2^31 - 1 (prime): permutation modulus


def perm_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the affine minwise permutations
    (LCG from seed — reproducible in the SQL oracle as plain literals)."""
    state = seed & 0x7FFFFFFF or 1
    out = []
    for _ in range(num_hashes):
        state = (1103515245 * state + 12345) % (1 << 31)
        a = state % (MERSENNE31 - 1) + 1
        state = (1103515245 * state + 12345) % (1 << 31)
        b = state % MERSENNE31
        out.append((a, b))
    return out


def shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles of whitespace-tokenized text (distinct)."""
    return word_shingles(col, n)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig) where sig = array of num_hashes int64 minima.
    Documents with no shingle produce no row (dropped by the explode)."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    # one md5 per shingle; a_i·h + b_i stays < 2^62 (no overflow)
    base = (
        df.select(
            F.col(id_col),
            F.explode(shingles(text_col, shingle_n)).alias("__s"),
        )
        .select(
            id_col,
            (
                F.conv(F.substring(F.md5("__s"), 1, 15), 16, 10).cast("long")
                % MERSENNE31
            ).alias("__h"),
        )
    )
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % MERSENNE31).alias(f"__m{i}")
        for i, (a, b) in enumerate(perm_coeffs(num_hashes, seed))
    ]
    return (
        base.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("sig"),
        )
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
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * r + 1, r),
                                lambda x: x.cast("string"),
                            ),
                            "|",
                        )
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
