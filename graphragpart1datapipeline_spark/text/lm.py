"""N-gram language-model quality scoring for corpus curation.

The standard pre-training filter (CCNet / Wenzek et al. 2020 use a
KenLM 5-gram; Gopher and RefinedWeb use the same shape): train an
n-gram model on the corpus (or a trusted reference slice), then score
every document by its per-token model probability and drop the tails.
This module implements the distributed bigram variant with an exactly
replayable integer scoring scheme, so the whole train+score pipeline is
verifiable against an ANSI-SQL oracle.

Scale shape: bigram extraction is row-local (one ``transform`` over the
token array — no posexplode self-join); the model is ONE
(w1, w2)-groupBy with map-side partial aggregation (vocab²-bounded
output, corpus-sized input); context totals reuse the already-unique
model rows (vocab-sized groupBy). Scoring joins each document's bigrams
against the model — at real scale the model is orders of magnitude
smaller than the corpus, so the join broadcasts and the corpus is never
shuffled (``spark.sql.autoBroadcastJoinThreshold`` governs; below it,
AQE picks the broadcast side at runtime).

Determinism: per-bigram probability c(w1,w2)/c(w1) is a single IEEE
division of exact integers; it is scaled to ``floor(p * 1e6 + 0.5)``
BIGINT "micro-probability" units so the per-document sum is integer
arithmetic — order-independent and bit-identical in every engine. (A
log-probability sum would hit libm ulp drift; the scaled linear mean
ranks documents the same way for filtering purposes.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens

PROB_SCALE = 1_000_000


def doc_bigrams(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """Lower-cased word bigrams per document, row-local (no shuffle):
    tokens → transform over the leading n-1 slots pairing each token
    with its successor → explode. Documents with < 2 tokens produce no
    rows here; scorers re-attach them with a left join."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.slice(
                        "__toks",
                        1,
                        F.greatest(F.size("__toks") - 1, F.lit(0)),
                    ),
                    lambda x, i: F.struct(
                        x.alias("w1"),
                        F.get("__toks", i + 1).alias("w2"),
                    ),
                )
            ).alias("__bg"),
        )
        .select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )


def bigram_lm_train(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train the bigram model: (w1, w2, n2, n1) where n2 = corpus count
    of the bigram and n1 = corpus count of w1 as a bigram context
    (= sum of n2 over w2 — derived from the model rows themselves, no
    second corpus pass)."""
    bg = doc_bigrams(df, text_col, id_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    return c2.join(c1, "w1").select("w1", "w2", "n2", "n1")


def bigram_lm_score(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document against a bigram model (default: trained on
    ``df`` itself — self-perplexity, the dedup/outlier screen).

    Returns (id_col, n_bigrams, lm_score_micro, mean_prob_micro):
    lm_score_micro = Σ floor(c(w1,w2)/c(w1) · 1e6 + 0.5) over the
    document's bigrams (BIGINT, exact); mean_prob_micro divides by the
    bigram count (one IEEE division). Documents with < 2 tokens keep a
    row with n_bigrams = 0 and NULL mean (the empty-row-preservation
    contract shared with remove_repeated_passages / bpe_apply).
    """
    if model is None:
        model = bigram_lm_train(df, text_col, id_col)
    if broadcast_model:
        model = F.broadcast(model)
    bg = doc_bigrams(df, text_col, id_col)
    p_micro = F.floor(
        (F.col("n2") * F.lit(float(PROB_SCALE))) / F.col("n1") + F.lit(0.5)
    ).cast("long")
    per_doc = (
        bg.join(model, ["w1", "w2"], "left")
        .select(F.col(id_col), F.coalesce(p_micro, F.lit(0)).alias("__p"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__p").alias("lm_score_micro"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("lm_score_micro", F.lit(0))
            .cast("long")
            .alias("lm_score_micro"),
            (
                F.when(
                    F.coalesce("n_bigrams", F.lit(0)) > 0,
                    F.col("lm_score_micro").cast("double")
                    / F.col("n_bigrams"),
                )
            ).alias("mean_prob_micro"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_size: int = 128,
    seed: str | int = 42,
) -> DataFrame:
    """CCNet-style head/middle/tail partitioning (Wenzek et al. 2020):
    score every document with the bigram LM, calibrate two tercile
    cutoffs, and label each document ``head`` (most model-like),
    ``middle``, or ``tail``. CCNet trains its curation decisions on
    exactly this split — keep head, maybe middle, drop tail.

    Scale shape: the cutoffs come from a BOUNDED deterministic
    calibration sample (the ``sample_size`` scored docs with smallest
    ``md5(seed ':' id)`` — the engine's seeding rule), NOT from a
    global rank: a corpus-wide exact tercile is a distributed
    selection problem, and CCNet itself calibrates thresholds on a
    sample. The sample is a top-K job (k bounded, driver-merged
    heaps); bucket assignment is then a map-only comparison over the
    corpus — no global sort or window anywhere. Documents with < 2
    tokens (no LM evidence) always land in ``tail``.

    Determinism / oracle parity: scores are q107's exact integer
    micro-probabilities; the mean is one IEEE division; cutoffs are
    the sample's nearest-rank tercile values under (mean desc, id
    asc); assignment is pure value comparison — every stage replays
    in SQL. Ties AT a cutoff go to the better bucket (>=).

    Returns (id, n_bigrams, lm_score_micro, mean_prob_micro, bucket).
    """
    if sample_size < 3:
        raise ValueError(
            f"ccnet_buckets: sample_size must be >= 3, got {sample_size}"
        )
    # the scored frame feeds BOTH the calibration-sample collect and
    # the returned assignment — materialize once, or the self-trained
    # LM and the corpus scoring run twice (the dsir_weights pattern)
    scored = bigram_lm_score(df, model, text_col, id_col).localCheckpoint(
        eager=True
    )
    nn = scored.filter(F.col("mean_prob_micro").isNotNull())
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    sample = (
        nn.select(F.col(id_col), "mean_prob_micro", key.alias("__k"))
        .orderBy("__k", F.col(id_col))
        .limit(sample_size)
        .select(id_col, "mean_prob_micro")
        .collect()
    )
    if not sample:
        return scored.withColumn("bucket", F.lit("tail"))
    vals = sorted(
        sample, key=lambda r: (-r["mean_prob_micro"], r[id_col])
    )
    s = len(vals)
    # nearest-rank tercile cutoffs: head needs mean >= the value at
    # rank ceil(s/3), middle >= the value at rank ceil(2s/3)
    c1 = vals[(s + 2) // 3 - 1]["mean_prob_micro"]
    c2 = vals[(2 * s + 2) // 3 - 1]["mean_prob_micro"]
    bucket = (
        F.when(F.col("mean_prob_micro").isNull(), F.lit("tail"))
        .when(F.col("mean_prob_micro") >= c1, F.lit("head"))
        .when(F.col("mean_prob_micro") >= c2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn("bucket", bucket)
