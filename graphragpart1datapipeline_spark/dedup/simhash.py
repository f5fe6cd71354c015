"""SimHash near-duplicate fingerprinting.

64-bit SimHash over word tokens: each token hashes to 64 bits (xxhash64
— JVM-side, no Python); per-document, every bit position accumulates
+1/-1 by the token's bit; the sign vector is the fingerprint. Near-dups
= fingerprints within a small Hamming distance.

Scale path: band the 64-bit fingerprint into k chunks; by pigeonhole,
two docs within Hamming distance d share at least one of d+1 chunks —
a bucket-join per chunk instead of an O(n²) Hamming scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 64


def _pack_udf(parse_hex: bool):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def pack(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        shifts = np.arange(BITS, dtype=np.uint64)
        for s in batches:
            out = []
            for h in s:
                if h is None:
                    out.append(None)
                    continue
                if parse_hex:
                    arr = np.asarray(
                        [int(x, 16) for x in h], dtype=np.uint64
                    )
                else:
                    arr = np.asarray(h, dtype=np.int64).view(np.uint64)
                ones = ((arr[:, None] >> shifts) & 1).sum(axis=0)
                # majority rule; T=0 -> every bit true (matches the
                # expression form's 0 >= 0)
                sign_bits = (2 * ones >= len(arr)).astype(np.uint64)
                fp = (sign_bits << shifts).sum(dtype=np.uint64)
                out.append(int(fp.astype(np.int64)))
            yield pd.Series(out, dtype="Int64")

    return pack


def simhash64(col: Column | str, hash_fn: str = "xxhash64") -> Column:
    """64-bit SimHash of whitespace tokens as a signed long.

    Token hashing stays JVM-side; the 64-way bit-count accumulation
    runs as ONE Arrow-batched numpy pass per batch — the per-bit
    pure-expression formulation (64 separate ``aggregate`` folds)
    bloats Catalyst codegen past the JIT budget and evaluates
    interpreted, seconds-slow. Bit-for-bit the same fingerprints: same
    hashes, same ``2·ones ≥ T`` majority rule (empty token set → all
    bits set → -1; null text → null).

    ``hash_fn``: ``"xxhash64"`` (default — one JVM hash per token,
    fastest) or ``"md5"`` (first 16 md5 hex digits as uint64 —
    engine-portable, the DuckDB-oracle configuration; identical
    packing logic, q34 hash-checks it end to end).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.split(F.trim(c), r"\s+"))
    if hash_fn == "xxhash64":
        hashes = F.transform(toks, lambda t: F.xxhash64(t))
    elif hash_fn == "md5":
        hashes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, 16))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return _pack_udf(parse_hex=(hash_fn == "md5"))(hashes)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit longs via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by banded SimHash: split the 64-bit fingerprint
    into ``bands`` 16-bit chunks, bucket-join on any equal chunk
    (pigeonhole guarantees recall for distance < bands), verify exact
    Hamming ≤ max_hamming. Returns (a, b, hamming)."""
    from ..util import ensure_parallelism

    df = ensure_parallelism(df)
    fp = df.select(F.col(id_col), simhash64(text_col).alias("fp"))
    return fingerprint_near_dup_pairs(
        fp, id_col=id_col, fp_col="fp",
        max_hamming=max_hamming, bands=bands, bits=BITS,
    )


def fingerprint_near_dup_pairs(
    fp: DataFrame,
    id_col: str,
    fp_col: str = "fp",
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = BITS,
) -> DataFrame:
    """The banded hamming join over ANY precomputed fingerprint long —
    the SimHash machinery factored out so other fingerprint families
    ride the same pigeonhole (image dHash, winnowed doc hashes, …):
    split the ``bits``-wide fingerprint into ``bands`` chunks, bucket-
    join on any equal chunk (recall guaranteed for hamming < bands),
    verify exact bit_count(xor) ≤ max_hamming. Returns (a, b, hamming).
    Only fingerprints sharing a full identical chunk ever pair — never
    all-pairs."""
    if bands < 1 or bits % bands != 0:
        raise ValueError(
            f"fingerprint_near_dup_pairs: bits={bits} must divide into "
            f"bands={bands} equal chunks"
        )
    width = bits // bands
    fp = fp.select(F.col(id_col), F.col(fp_col).alias("fp")).cache()
    chunks = fp.select(
        id_col,
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("fp"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bc"),
    ).select(id_col, "fp", "bc.band", "bc.chunk")
    left = chunks.select(
        "band", "chunk", F.col(id_col).alias("a"), F.col("fp").alias("fp_a")
    )
    right = chunks.select(
        "band", "chunk", F.col(id_col).alias("b"), F.col("fp").alias("fp_b")
    )
    cand = (
        left.join(right, ["band", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "fp_a", "fp_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
