"""Incremental corpus curation: keep a curated document state AND its
derived indexes (MinHash-LSH bucket table, hash-embedding vector store)
current from a document CHANGE FEED — without ever recomputing the
corpus. This is the operating mode a 100 TB pipeline actually runs in:
the initial build happens once; every day after that is an increment.

State layout (all versioned parquet, crash-safe like streaming/cdc):

    root/docs/v{N}   CDC document state (+__cdc_seq, +__cdc_deleted)
    root/lsh/v{N}    (doc_id, band, bucket) LSH index of LIVE docs
    root/emb/v{N}    (doc_id, embedding) hash-embedding store of LIVE docs

The maintained invariant — checked by test_incremental_demo — is
REBUILD EQUIVALENCE: after applying a change feed in ANY batch split,
every index equals what a from-scratch rebuild over the final live
state produces. That holds by induction because each increment replaces
exactly the touched keys' index rows:

    new_index = old_index ⟨anti-join touched⟩ ∪ derive(touched ∧ alive)

and the CDC merge itself is out-of-order-safe (per-key applied seq +
tombstones). Per increment the work is: one change-feed window, one
key anti-join per index, and derivation over the TOUCHED rows only —
the corpus is never re-read, re-hashed, or re-embedded.

Near-dup flags against the standing index come from
``minhash_lsh_incremental(corpus_buckets=...)`` — advisory per-batch
output (what to quarantine), while the indexes stay pure functions of
the live state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.minhash import (
    lsh_bucket_table,
    minhash_lsh_incremental,
    minhash_signatures,
)
from ..operators.relational import cdc_live, cdc_upsert_state
from ..streaming.cdc import _latest_version, init_cdc_state
from ..vector.search import hash_embed

NUM_HASHES = 8
BANDS = 4
EMB_DIM = 16


def _read_latest(spark: SparkSession, d: str) -> DataFrame:
    v = _latest_version(d)
    if v < 0:
        raise FileNotFoundError(d)
    return spark.read.parquet(os.path.join(d, f"v{v}"))


def _write_next(df: DataFrame, d: str) -> None:
    from ..streaming.cdc import _mark_committed

    vdir = os.path.join(d, f"v{_latest_version(d) + 1}")
    df.write.mode("overwrite").parquet(vdir)
    _mark_committed(df.sparkSession, vdir)


def _lsh_rows(docs: DataFrame) -> DataFrame:
    sigs = minhash_signatures(
        docs.select("doc_id", "text"), num_hashes=NUM_HASHES
    )
    return lsh_bucket_table(sigs, bands=BANDS)


def _emb_rows(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", hash_embed("text", dim=EMB_DIM).alias("embedding")
    )


def init_corpus_state(
    spark: SparkSession, root: str, docs: DataFrame
) -> None:
    """One-time build: seed the CDC state and derive both indexes from
    the initial live corpus. ``docs`` = (doc_id, text)."""
    init_cdc_state(docs.select("doc_id", "text"), os.path.join(root, "docs"))
    _write_next(_lsh_rows(docs), os.path.join(root, "lsh"))
    _write_next(_emb_rows(docs), os.path.join(root, "emb"))


def apply_increment(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    jaccard_threshold: float = 0.7,
) -> dict:
    """Apply one change batch (doc_id, text, seq, op) and refresh both
    indexes for exactly the touched keys. Returns per-stage counts plus
    the advisory near-dup flags of the batch's upserts against the
    standing LSH index (computed BEFORE the index absorbs them)."""
    docs_dir = os.path.join(root, "docs")
    lsh_dir = os.path.join(root, "lsh")
    emb_dir = os.path.join(root, "emb")

    state = _read_latest(spark, docs_dir)
    old_lsh = _read_latest(spark, lsh_dir)
    old_emb = _read_latest(spark, emb_dir)

    # advisory: which incoming upserts near-duplicate the standing
    # corpus (index rows of keys being replaced excluded — a doc must
    # not match its own previous revision)
    incoming = changes.filter(F.col("op") != "D").select("doc_id", "text")
    standing = old_lsh.join(
        changes.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    flags = minhash_lsh_incremental(
        incoming,
        corpus_df=cdc_live(state).select("doc_id", "text"),
        corpus_buckets=standing,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        jaccard_threshold=jaccard_threshold,
    )

    new_state = cdc_upsert_state(state, changes, ["doc_id"], "seq")
    _write_next(new_state, docs_dir)

    touched = changes.select("doc_id").distinct()
    live_touched = cdc_live(new_state).join(touched, "doc_id", "left_semi")
    new_lsh = old_lsh.join(touched, "doc_id", "left_anti").unionByName(
        _lsh_rows(live_touched)
    )
    _write_next(new_lsh, lsh_dir)
    new_emb = old_emb.join(touched, "doc_id", "left_anti").unionByName(
        _emb_rows(live_touched)
    )
    _write_next(new_emb, emb_dir)

    return {
        "changes": changes.count(),
        "touched_keys": touched.count(),
        "live_after": cdc_live(new_state).count(),
        "near_dup_flags": flags.count(),
    }


def rebuild_indexes(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    """From-scratch derivation over the current live state — the
    equivalence target the incremental path must match."""
    live = cdc_live(_read_latest(spark, os.path.join(root, "docs")))
    return {"lsh": _lsh_rows(live), "emb": _emb_rows(live)}


def read_indexes(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    return {
        "lsh": _read_latest(spark, os.path.join(root, "lsh")),
        "emb": _read_latest(spark, os.path.join(root, "emb")),
    }
