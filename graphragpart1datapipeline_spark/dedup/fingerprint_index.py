"""Persisted PERCEPTUAL-HASH index with incremental verbs — the
multimodal twin of :mod:`.incremental`'s embedding_lsh_index family
(round-9 verdict task 4). The batch pairers (image dHash q236, video
frame hashes q248, any :func:`..dedup.simhash.fingerprint_near_dup_pairs`
input) re-pair the WHOLE asset corpus on every run; a daily crawl
needs the increment-sized discipline every text/vector family already
has: persist the fingerprints once, probe only new×corpus + new×new.

Index tables (the dict-of-DataFrames contract shared by
bm25_index / embedding_lsh_index; persist with an ordinary parquet
write partitioned by ``band`` so an increment's probe prunes to its
colliding band partitions):

* ``bands`` — (rid, band, chunk, fp): one row per (asset, band),
  ``chunk`` = the band's bits of the fingerprint, ``fp`` the full
  fingerprint riding along so candidate verification (one
  bit_count(xor)) never consults the asset corpus at all — exactly
  the unit-vector-in-the-index rule of embedding_lsh_index.
* ``params`` — (bands, bits) baked in: band chunks are only
  comparable under the geometry they were cut with.

Exactness contract (the split-apply == rebuild oracle, q209 pattern):
``upsert(index(c), n)`` equals ``index(c ∪ n)`` row-for-row for
rid-disjoint increments, and the increment probe returns exactly the
near-dup pairs of the union that touch a new id. Recall is the banded
pigeonhole's: guaranteed for hamming < bands, identical batch and
incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .incremental import _check_params, _params_table
from .simhash import fingerprint_near_dup_pairs, hamming64

__all__ = [
    "fingerprint_index",
    "fingerprint_upsert",
    "fingerprint_delete",
    "fingerprint_near_dup_incremental",
]


def _band_rows(
    fp_df: DataFrame, id_col: str, fp_col: str, bands: int, bits: int
) -> DataFrame:
    if bands < 1 or bits % bands != 0:
        raise ValueError(
            f"fingerprint index: bits={bits} must divide into "
            f"bands={bands} equal chunks"
        )
    width = bits // bands
    return (
        fp_df.select(F.col(id_col).alias("rid"), F.col(fp_col).alias("fp"))
        .select(
            "rid",
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
        )
        .select(
            "rid",
            F.col("bc.band").alias("band"),
            F.col("bc.chunk").alias("chunk"),
            "fp",
        )
    )


def fingerprint_index(
    fp_df: DataFrame,
    id_col: str = "asset_id",
    fp_col: str = "fp",
    bands: int = 4,
    bits: int = 56,
) -> dict[str, DataFrame]:
    """Build the persisted band-bucket index over precomputed
    fingerprints (the EXPENSIVE decode+hash runs once, upstream —
    assets.py/video.py; this table is 8-byte integers per band).
    At 100 TB: |corpus|·bands rows of 4 small columns, partitioned by
    band at rest — the decode seam never re-runs for maintenance."""
    return {
        "bands": _band_rows(fp_df, id_col, fp_col, bands, bits),
        "params": _params_table(fp_df.sparkSession, bands=bands, bits=bits),
    }


def fingerprint_upsert(
    index: dict[str, DataFrame],
    new_fp: DataFrame,
    id_col: str = "asset_id",
    fp_col: str = "fp",
    bands: int = 4,
    bits: int = 56,
) -> dict[str, DataFrame]:
    """Fold an increment in: incoming rids REPLACE their old rows
    (broadcast anti-join against the increment-sized rid set), fresh
    band rows are cut from the increment only — the corpus
    fingerprints are never re-read. upsert(upsert(ix, a), b) ==
    index(corpus ∪ a ∪ b) for rid-disjoint increments."""
    _check_params(index, "fingerprint_upsert", bands=bands, bits=bits)
    fresh = _band_rows(new_fp, id_col, fp_col, bands, bits)
    new_ids = fresh.select("rid").distinct()
    kept = index["bands"].join(F.broadcast(new_ids), "rid", "left_anti")
    return {"bands": kept.unionByName(fresh), "params": index["params"]}


def fingerprint_delete(
    index: dict[str, DataFrame],
    ids: DataFrame,
    id_col: str = "asset_id",
) -> dict[str, DataFrame]:
    """Takedown verb: one broadcast anti-join against the
    deletion-sized rid set. Band rows are per-asset, so the remaining
    rows ARE the index of the remaining corpus —
    delete(index(c), d) == index(c − d) exactly; absent ids no-op."""
    col = id_col if id_col in ids.columns else ids.columns[0]
    rid = ids.select(F.col(col).alias("rid")).distinct()
    return {
        "bands": index["bands"].join(F.broadcast(rid), "rid", "left_anti"),
        "params": index["params"],
    }


def fingerprint_near_dup_incremental(
    new_fp: DataFrame,
    index: dict[str, DataFrame],
    id_col: str = "asset_id",
    fp_col: str = "fp",
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 56,
) -> DataFrame:
    """All near-dup pairs of (corpus ∪ new) touching a NEW id:
    new×corpus via the band join against the persisted index (prunes
    to colliding band partitions; the fp rides in the index so the
    verify is one bit_count(xor) — the corpus asset table is never
    read), plus new×new via the ordinary batch pairer over the
    increment alone. Increment-sized cost; ids assumed rid-disjoint
    from the corpus (the upsert-first contract — an id present on
    both sides would pair with its own old version). Returns
    (a, b, hamming) with a < b, the batch pairer's exact shape, so a
    full-rebuild oracle compares row-for-row."""
    _check_params(
        index, "fingerprint_near_dup_incremental", bands=bands, bits=bits
    )
    probe = _band_rows(new_fp, id_col, fp_col, bands, bits)
    vs_corpus = (
        probe.select("band", "chunk", F.col("rid").alias("n"),
                     F.col("fp").alias("fp_n"))
        .join(
            index["bands"].select(
                "band", "chunk", F.col("rid").alias("c"),
                F.col("fp").alias("fp_c"),
            ),
            ["band", "chunk"],
        )
        .filter(F.col("n") != F.col("c"))
        .select(
            F.least("n", "c").alias("a"),
            F.greatest("n", "c").alias("b"),
            F.col("fp_n").alias("fp_a"),
            F.col("fp_c").alias("fp_b"),
        )
        .distinct()
        .withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    vs_new = fingerprint_near_dup_pairs(
        new_fp, id_col=id_col, fp_col=fp_col,
        max_hamming=max_hamming, bands=bands, bits=bits,
    )
    return vs_corpus.unionByName(vs_new)
