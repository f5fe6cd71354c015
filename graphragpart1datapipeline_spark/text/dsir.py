"""DSIR-style data selection (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling") — score every raw-corpus
document by how target-like it is under hashed n-gram bag-of-words
language models, then keep the top-weight slice. This is the
curation step between dedup and training: given a small high-quality
TARGET set (curated wiki, textbooks, the eval-adjacent domain), pull
the raw-web documents that look like it.

Recipe (the paper's, shaped for Spark):

1. FEATURES: every unigram and bigram hashes into ``buckets`` slots
   (hashing trick — fixed-width model no matter the vocabulary).
2. Fit two bag-of-words models: ``p`` on the target set, ``q`` on the
   raw corpus — bucket counts with add-1 smoothing, i.e.
   ``p_b = (cnt_b + 1) / (total + buckets)``.
3. Per raw document: importance weight
   ``log w = Σ_b c_b(doc) · (ln p_b − ln q_b)``.
4. Keep the top ``frac`` of documents by weight (the paper resamples
   with Gumbel noise; the engine default is the deterministic top-cut,
   which is what production pipelines run — pass the ranked weights to
   a sampler if resampling is wanted).

Scale shape: two feature scans (target is small, corpus is the big
one), each collapsing map-side into ≤ ``buckets`` partial counts —
the shuffle is bucket-width, not corpus-width. The per-bucket
log-ratio table (≤ ``buckets`` rows) BROADCASTS onto the corpus
feature stream; per-doc weights are one doc-keyed aggregation. No
all-pairs anything, no Python in the hot path.

Determinism / oracle parity (q230): features hash with the md5→hex→
int idiom (engine-portable); each bucket's log-ratio is computed once
with ``ln`` then half-up rounded to a SCALED LONG (1e-6), so the
per-doc weight is an exact integer dot product (count · scaled-llr
sums in longs) — the oracle replays it exactly; ln's final-ulp wobble
across libms is absorbed by the rounding (a boundary hit needs the
true value within ~1e-16 of a 5e-7 cell edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens

__all__ = [
    "gram_array",
    "gram_bucket",
    "hashed_ngram_features",
    "dsir_weights",
    "dsir_select",
]


def gram_array(text_col):
    """Row-local unigram + bigram gram array (non-empty grams, document
    order) — THE feature construction, shared by
    :func:`hashed_ngram_features` (which explodes it) and the row-local
    NB scorer (text/classify.py nb_classify_expr, which folds it with
    ``aggregate``). One implementation to audit: a private copy in the
    scorer would let the trained model and the serving expression
    silently drift apart."""
    toks = tokens(text_col)
    sz = F.size(toks)
    bigrams = F.when(
        sz >= 2,
        F.transform(
            F.sequence(F.lit(0), sz - 2),
            lambda s: F.concat_ws(" ", F.slice(toks, s + 1, 2)),
        ),
    ).otherwise(
        F.slice(F.sequence(F.lit(0), F.lit(0)), 1, 0).cast("array<string>")
    )
    return F.filter(F.concat(toks, bigrams), lambda g: g != "")


def gram_bucket(col, buckets: int):
    """Hash bucket of a gram: md5, first 8 hex chars, mod ``buckets``
    — the engine's portable-hash idiom, replayable in SQL."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % buckets
    )


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """(id, bucket, cnt) — unigram + bigram counts hashed into
    ``buckets`` slots (:func:`gram_array` + :func:`gram_bucket`).
    Map-only until the (id, bucket) rollup."""
    if buckets < 2:
        raise ValueError(
            f"hashed_ngram_features: buckets must be >= 2, got {buckets}"
        )
    return (
        df.select(F.col(id_col), F.explode(gram_array(text_col)).alias("__gram"))
        .select(id_col, gram_bucket(F.col("__gram"), buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_model(feats: DataFrame) -> DataFrame:
    """(bucket, cnt) global counts — missing buckets are implicit
    zeros (the smoothing constant covers them at ratio time)."""
    return feats.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    llr_scale: int = 1_000_000,
) -> DataFrame:
    """Per-raw-document importance weights: (id, weight) with
    ``weight = Σ_b c_b · llr_b`` and ``llr_b = round(ln(p_b/q_b)·s)/s``
    (p fit on ``target``, q on ``raw``, add-1 smoothing, s =
    ``llr_scale``). Higher weight = more target-like. The weight is an
    exact scaled-integer sum divided once by s — deterministic under
    any partitioning and engine."""
    raw_f = raw.select(id_col, text_col)
    tgt_f = target.select(text_col)
    # the corpus feature frame feeds BOTH the q model and the final
    # weight join — materialize it once instead of re-tokenizing the
    # 100 TB corpus twice
    rf = hashed_ngram_features(
        raw_f, id_col, text_col, buckets
    ).localCheckpoint(eager=False)
    tf = hashed_ngram_features(
        tgt_f.select(F.lit(0).alias("__tid"), text_col),
        "__tid",
        text_col,
        buckets,
    )
    qm = _bucket_model(rf)
    pm = _bucket_model(tf)
    totals = qm.agg(F.sum("cnt").alias("qt")).crossJoin(
        pm.agg(F.sum("cnt").alias("pt"))
    )
    # one ≤buckets-row table: scaled-long llr per bucket; buckets with
    # zero target AND zero raw count never appear in any doc either,
    # so the outer join universe is exactly the buckets that matter
    ratio = (
        qm.withColumnRenamed("cnt", "qc")
        .join(pm.withColumnRenamed("cnt", "pc"), "bucket", "full")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("pc"), F.lit(0)) + 1).cast("double")
                        / (F.col("pt") + buckets)
                    )
                    / (
                        (F.coalesce(F.col("qc"), F.lit(0)) + 1).cast("double")
                        / (F.col("qt") + buckets)
                    )
                )
                * llr_scale
                + F.lit(0.5)
            )
            .cast("long")
            .alias("illr"),
        )
    )
    return (
        rf.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            (
                F.sum(F.col("cnt") * F.col("illr")).cast("double")
                / F.lit(float(llr_scale))
            ).alias("weight")
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    frac: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """The top-``frac`` most target-like slice of ``raw`` (all raw
    columns + ``weight``), deterministic cut: order by (weight desc,
    id asc), keep ``ceil(frac · n)`` — a sort+limit, which Spark runs
    as distributed top-K (TakeOrderedAndProject: each partition keeps
    its local top ``keep``, the driver merges k-sized heaps — no
    global sort, no single-task window). Documents with NO features
    (empty text) score no weight row and are never selected."""
    if not (0.0 < frac <= 1.0):
        raise ValueError(f"dsir_select: frac must be in (0, 1], got {frac}")
    import math

    w = dsir_weights(raw, target, id_col, text_col, buckets)
    keep = math.ceil(raw.count() * frac)
    ranked = w.orderBy(F.desc("weight"), F.asc(id_col)).limit(keep)
    return raw.join(ranked.select(id_col, "weight"), id_col)
