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


def doc_trigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
):
    """Lower-cased word trigrams per document, row-local (the
    :func:`doc_bigrams` shape one order up): tokens → transform over
    the leading n-2 slots → explode. Documents with < 3 tokens produce
    no rows here; scorers re-attach them with a left join."""
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
                        F.greatest(F.size("__toks") - 2, F.lit(0)),
                    ),
                    lambda x, i: F.struct(
                        x.alias("w1"),
                        F.get("__toks", i + 1).alias("w2"),
                        F.get("__toks", i + 2).alias("w3"),
                    ),
                )
            ).alias("__tg"),
        )
        .select(
            id_col,
            F.col("__tg.w1").alias("w1"),
            F.col("__tg.w2").alias("w2"),
            F.col("__tg.w3").alias("w3"),
        )
    )


def kn_trigram_train(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict[str, DataFrame]:
    """Train the Kneser-Ney backoff trigram model (round-9 verdict
    task 7 — the CCNet filter's actual KenLM shape, one order short of
    its 5-gram): FIVE tables, every one derived from the single
    trigram-type table with vocab-bounded groupBys (the corpus is
    scanned ONCE; at 100 TB the model tables are orders of magnitude
    smaller than the corpus and broadcast at scoring time):

    * ``tri``   (w1,w2,w3,c3)       — trigram counts.
    * ``ctx12`` (w1,w2,c2ctx,n1p12) — context totals + distinct-
      continuation counts N1+(w1,w2,·), the discount leftover mass.
    * ``cont2`` (w2,w3,cc2)         — KN CONTINUATION bigram counts
      N1+(·,w2,w3): in how many distinct left-contexts was (w2,w3)
      seen — Kneser-Ney's defining substitution (a bigram frequent
      only inside one fixed phrase backs off LOW).
    * ``ctx2``  (w2,ccctx2,n1p2)    — continuation context totals.
    * ``cont1`` (w3,cont3)          — continuation unigram counts
      N1+(·,·,w3) over bigram TYPES; P_cont(w3) = cont3 / #types.
    """
    tg = doc_trigrams(df, text_col, id_col)
    tri = tg.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    ctx12 = tri.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c2ctx"), F.count(F.lit(1)).alias("n1p12")
    )
    cont2 = tri.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("cc2"))
    ctx2 = cont2.groupBy("w2").agg(
        F.sum("cc2").alias("ccctx2"), F.count(F.lit(1)).alias("n1p2")
    )
    cont1 = cont2.groupBy("w3").agg(F.count(F.lit(1)).alias("cont3"))
    return {
        "tri": tri, "ctx12": ctx12, "cont2": cont2,
        "ctx2": ctx2, "cont1": cont1,
    }


def kn_trigram_score(
    df: DataFrame,
    model: dict[str, DataFrame] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: tuple[int, int] = (3, 4),
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document under the absolute-discount backoff
    trigram model (default: trained on ``df`` itself). Per trigram
    (D = ``discount`` as an exact fraction, default 3/4):

    * seen trigram:     p = (4·c3 − 3) / (4·c2ctx)
    * else, seen (w1,w2) context: back off with
      α(w1,w2) = 3·N1+(w1,w2,·) / (4·c2ctx) — the EXACT mass the
      discount freed; unseen context → α = 1 (the KenLM rule);
    * bigram level uses KN CONTINUATION counts (cc2 / ccctx2) with
      the same discount, backing off to
    * P_cont(w3) = cont3 / #bigram-types, OOV → 1 / (#types + 1).

    Every probability is a ratio (or product of ratios) of EXACT
    integer counts evaluated in a fixed IEEE operation order, then
    ``ln`` is taken ONCE per trigram and half-up rounded to a scaled
    long (micro-nats — the q230 rule: libm final-ulp wobble is
    absorbed by the single rounding), so the per-document sum is
    exact BIGINT arithmetic and the whole train+score pipeline
    replays in SQL (q258). Returns (id, n_trigrams, kn_ll_micro,
    mean_ll_micro); documents with < 3 tokens keep a row with
    n_trigrams = 0 and NULL mean. The one driver-side scalar is the
    bigram-type total (bounded, the q239 cutoff-collect pattern)."""
    if model is None:
        model = kn_trigram_train(df, text_col, id_col)
    dn, dd = discount
    if not (0 < dn < dd):
        raise ValueError(
            f"kn_trigram_score: discount must be a fraction in (0,1), "
            f"got {dn}/{dd}"
        )
    n_types = model["cont2"].count()
    b = F.broadcast if broadcast_model else (lambda x: x)
    tg = doc_trigrams(df, text_col, id_col)
    j = (
        tg.join(b(model["tri"]), ["w1", "w2", "w3"], "left")
        .join(b(model["ctx12"]), ["w1", "w2"], "left")
        .join(b(model["cont2"]), ["w2", "w3"], "left")
        .join(b(model["ctx2"]), ["w2"], "left")
        .join(b(model["cont1"]), ["w3"], "left")
    )
    dnl, ddl = F.lit(float(dn)), F.lit(float(dd))
    pu = F.when(
        F.col("cont3").isNotNull(),
        F.col("cont3").cast("double") / F.lit(float(n_types)),
    ).otherwise(F.lit(1.0) / F.lit(float(n_types + 1)))
    pb = F.when(
        F.col("cc2").isNotNull(),
        (ddl * F.col("cc2") - dnl) / (ddl * F.col("ccctx2")),
    ).otherwise(
        F.when(
            F.col("ccctx2").isNotNull(),
            (dnl * F.col("n1p2")) / (ddl * F.col("ccctx2")),
        ).otherwise(F.lit(1.0))
        * pu
    )
    p = F.when(
        F.col("c3").isNotNull(),
        (ddl * F.col("c3") - dnl) / (ddl * F.col("c2ctx")),
    ).otherwise(
        F.when(
            F.col("c2ctx").isNotNull(),
            (dnl * F.col("n1p12")) / (ddl * F.col("c2ctx")),
        ).otherwise(F.lit(1.0))
        * pb
    )
    ll = F.floor(
        F.log(p) * F.lit(float(PROB_SCALE)) + F.lit(0.5)
    ).cast("long")
    per_doc = (
        j.select(F.col(id_col), ll.alias("__ll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("__ll").alias("kn_ll_micro"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_trigrams", F.lit(0))
            .cast("long")
            .alias("n_trigrams"),
            F.coalesce("kn_ll_micro", F.lit(0))
            .cast("long")
            .alias("kn_ll_micro"),
            F.when(
                F.coalesce("n_trigrams", F.lit(0)) > 0,
                F.col("kn_ll_micro").cast("double") / F.col("n_trigrams"),
            ).alias("mean_ll_micro"),
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
    # the scored frame feeds BOTH the calibration-sample collect and
    # the returned assignment — materialize once, or the self-trained
    # LM and the corpus scoring run twice (the dsir_weights pattern)
    scored = bigram_lm_score(df, model, text_col, id_col).localCheckpoint(
        eager=True
    )
    return score_buckets(
        scored, "mean_prob_micro", id_col, sample_size, seed
    )


def score_buckets(
    scored: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    sample_size: int = 128,
    seed: str | int = 42,
) -> DataFrame:
    """The calibrate-and-assign stage of :func:`ccnet_buckets`,
    factored so ANY per-document quality score buckets the same way
    (the KN trigram rides it in :func:`ccnet_buckets_kn`): tercile
    cutoffs from the bounded deterministic sample (``sample_size``
    scored rows with smallest ``md5(seed ':' id)``), then a map-only
    ``bucket`` assignment (ties AT a cutoff go to the better bucket;
    NULL scores → tail). ``scored`` should already be materialized if
    it is expensive — this function collects the bounded sample and
    returns ``scored`` + ``bucket``."""
    if sample_size < 3:
        raise ValueError(
            f"score_buckets: sample_size must be >= 3, got {sample_size}"
        )
    nn = scored.filter(F.col(score_col).isNotNull())
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    sample = (
        nn.select(F.col(id_col), score_col, key.alias("__k"))
        .orderBy("__k", F.col(id_col))
        .limit(sample_size)
        .select(id_col, score_col)
        .collect()
    )
    if not sample:
        return scored.withColumn("bucket", F.lit("tail"))
    vals = sorted(sample, key=lambda r: (-r[score_col], r[id_col]))
    s = len(vals)
    # nearest-rank tercile cutoffs: head needs score >= the value at
    # rank ceil(s/3), middle >= the value at rank ceil(2s/3)
    c1 = vals[(s + 2) // 3 - 1][score_col]
    c2 = vals[(2 * s + 2) // 3 - 1][score_col]
    bucket = (
        F.when(F.col(score_col).isNull(), F.lit("tail"))
        .when(F.col(score_col) >= c1, F.lit("head"))
        .when(F.col(score_col) >= c2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn("bucket", bucket)


def ccnet_buckets_kn(
    df: DataFrame,
    model: dict[str, DataFrame] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_size: int = 128,
    seed: str | int = 42,
    discount: tuple[int, int] = (3, 4),
) -> DataFrame:
    """CCNet bucketing over the KNESER-NEY trigram LM — one fidelity
    rung closer to CCNet's actual KenLM filter than the bigram
    :func:`ccnet_buckets`: score with :func:`kn_trigram_score`
    (mean micro-nat log-likelihood — higher = more model-like, the
    same orientation as the bigram mean, so the >= cutoff rule
    carries over unchanged), then :func:`score_buckets`. Documents
    with < 3 tokens have NULL mean and land in tail. Train on a
    TRUSTED reference slice by passing ``model`` (CCNet trains on
    Wikipedia); default is self-trained."""
    scored = kn_trigram_score(
        df, model, text_col, id_col, discount
    ).localCheckpoint(eager=False)
    return score_buckets(
        scored, "mean_ll_micro", id_col, sample_size, seed
    )
