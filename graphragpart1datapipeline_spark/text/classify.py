"""Hashed multinomial Naive-Bayes text classification — the
fastText-shaped linear classifier every production curation stack
runs between heuristics and the expensive models (GPT-3's quality
LR over CommonCrawl, CCNet's fastText language filter, LLaMA's
wiki-reference classifier). Train on a small labeled seed set, score
the 100 TB corpus with one broadcast join.

Recipe (multinomial NB, add-1 smoothing, hashing trick):

1. FEATURES: :func:`..text.dsir.hashed_ngram_features` — every
   unigram and bigram hashes into ``buckets`` slots, so the model is
   fixed-width no matter the vocabulary (and shares the DSIR feature
   pipeline exactly — one implementation to audit).
2. TRAIN: per class ``c``, bucket log-likelihoods
   ``llw(b,c) = ln((cnt(b,c)+1)/(total_c+buckets))``, the unseen-
   bucket default ``llw0(c) = ln(1/(total_c+buckets))``, and the doc
   prior ``ln(n_c/n)``.
3. SCORE: ``score(d,c) = prior_c + Σ_b cnt_b · llw(b,c)``. Computed
   in the DIFFERENCE form
   ``prior_c + tot_d·llw0_c + Σ_{b∈model} cnt_b·(llw(b,c) − llw0_c)``
   so out-of-vocabulary buckets never need a join row — the join hits
   only the ≤ ``buckets``·#classes model table, which broadcasts.
4. PREDICT: argmax over classes, tie → smallest label.

Scale shape: training shuffles bucket-width counts (≤ buckets ×
#classes rows), never corpus-width; scoring is one corpus feature
scan + one broadcast join + one doc-keyed aggregation. No Python in
the hot path, no all-pairs anything.

Determinism / oracle parity (q238): every ``ln`` is rounded ONCE to
a scaled long (the q230 DSIR rule — llr_scale 1e-6 cells absorb
libm final-ulp wobble), after which scores are exact integer dot
products: ``iscore = iprior + tot·illw0 + Σ cnt·idelta`` in longs,
divided once by the scale at the end. Argmax compares longs — no
float comparison anywhere, so Spark, DuckDB, and any partitioning
agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import hashed_ngram_features

__all__ = [
    "nb_train",
    "nb_score",
    "nb_classify",
    "nb_classify_expr",
    "stream_quality_gate",
]


def _iln(expr, scale: int):
    """round(ln(expr)·scale) as a long — the round-once rule."""
    return F.floor(F.log(expr) * scale + F.lit(0.5)).cast("long")


def nb_train(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    scale: int = 1_000_000,
) -> dict[str, DataFrame]:
    """Fit the classifier on a labeled seed set. Returns two tables
    (the broadcastable model artifact — persist them beside the
    pipeline like any index):

    - ``model``: (label, bucket, idelta) — ``idelta = illw − illw0``,
      the scaled-long log-likelihood LIFT of seeing bucket ``b`` in
      class ``c`` over an unseen bucket. Only (class, observed-bucket)
      pairs appear: ≤ buckets × #classes rows.
    - ``classes``: (label, iprior, illw0) — scaled-long doc prior and
      unseen-bucket default per class.

    Both tables are exact integer artifacts: ``illw`` and ``illw0``
    are each rounded once from their own ``ln``, and ``idelta`` is
    their integer difference — the oracle replays every value."""
    if buckets < 2:
        raise ValueError(f"nb_train: buckets must be >= 2, got {buckets}")
    feats = hashed_ngram_features(
        labeled.select(id_col, text_col), id_col, text_col, buckets
    )
    lab = labeled.select(id_col, label_col)
    counts = (
        feats.join(lab, id_col)
        .groupBy(label_col, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    totals = counts.groupBy(label_col).agg(F.sum("cnt").alias("tot"))
    n_docs = lab.groupBy(label_col).agg(F.count(F.lit(1)).alias("nc"))
    n_all = lab.count()
    if n_all == 0:
        raise ValueError("nb_train: empty training set")
    classes = (
        n_docs.join(totals, label_col, "left")
        .select(
            label_col,
            _iln(F.col("nc").cast("double") / F.lit(float(n_all)), scale)
            .alias("iprior"),
            # a class whose every doc is empty text still gets the
            # smoothed default over an all-zero model
            _iln(
                F.lit(1.0)
                / (F.coalesce(F.col("tot"), F.lit(0)) + buckets).cast(
                    "double"
                ),
                scale,
            ).alias("illw0"),
        )
    )
    model = (
        counts.join(totals, label_col)
        .select(
            label_col,
            "bucket",
            (
                _iln(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("tot") + buckets).cast("double"),
                    scale,
                )
                - _iln(
                    F.lit(1.0) / (F.col("tot") + buckets).cast("double"),
                    scale,
                )
            ).alias("idelta"),
        )
    )
    return {"model": model, "classes": classes}


def nb_score(
    df: DataFrame,
    model: dict[str, DataFrame] | DataFrame,
    classes: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    scale: int = 1_000_000,
    label_col: str = "label",
) -> DataFrame:
    """Per-(doc, class) log-probability scores: (id, label, iscore
    long, score double). ``buckets`` MUST match the training value
    (the hashing trick's one contract). One corpus feature scan; the
    model and class tables broadcast."""
    if isinstance(model, dict):
        classes = model["classes"]
        model = model["model"]
    if classes is None:
        raise ValueError("nb_score: classes table is required")
    feats = hashed_ngram_features(
        df.select(id_col, text_col), id_col, text_col, buckets
    )
    # a doc with no grams (empty text) still scores: prior only
    doc_tot = df.select(id_col).join(
        feats.groupBy(id_col).agg(F.sum("cnt").alias("tot")),
        id_col,
        "left",
    ).select(id_col, F.coalesce("tot", F.lit(0)).alias("tot"))
    matched = (
        feats.join(F.broadcast(model), "bucket")
        .groupBy(id_col, label_col)
        .agg(F.sum(F.col("cnt") * F.col("idelta")).alias("imatch"))
    )
    base = doc_tot.crossJoin(F.broadcast(classes))
    scored = base.join(matched, [id_col, label_col], "left").select(
        id_col,
        label_col,
        (
            F.col("iprior")
            + F.col("tot") * F.col("illw0")
            + F.coalesce(F.col("imatch"), F.lit(0))
        ).alias("iscore"),
    )
    return scored.withColumn(
        "score", F.col("iscore").cast("double") / F.lit(float(scale))
    )


def nb_classify(
    df: DataFrame,
    model: dict[str, DataFrame] | DataFrame,
    classes: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    scale: int = 1_000_000,
    label_col: str = "label",
) -> DataFrame:
    """Best class per document: (id, pred, score) — argmax over the
    :func:`nb_score` table, integer comparison, tie → smallest label.
    One extra doc-keyed aggregation over the scored stream."""
    scored = nb_score(
        df, model, classes, text_col, id_col, buckets, scale, label_col
    )
    best = scored.groupBy(id_col).agg(
        F.min(
            F.struct((-F.col("iscore")).alias("nis"), F.col(label_col))
        ).alias("__b")
    )
    return best.select(
        id_col,
        F.col(f"__b.{label_col}").alias("pred"),
        (
            (-F.col("__b.nis")).cast("double") / F.lit(float(scale))
        ).alias("score"),
    )


# model tables up to this many (bucket, class) literal entries ride in
# the plan as array literals for the row-local scorer — the PQ-codebook
# literal bound's pattern (vector/pq.py _LITERAL_BOOK_MAX_DOUBLES)
_LITERAL_MODEL_MAX_ENTRIES = 65536


def nb_classify_expr(
    fitted: dict[str, DataFrame],
    text_col: str = "text",
    buckets: int = 4096,
    scale: int = 1_000_000,
    label_col: str = "label",
):
    """ROW-LOCAL classification column — the whole trained model rides
    in the plan as per-class literal arrays (idelta indexed by bucket,
    ≤ buckets·#classes ints; bounded like the PQ codebook literal), so
    scoring is a pure column expression: tokens → grams → md5 bucket →
    literal-array lookup folded with ``aggregate`` — zero shuffle,
    zero state, whole-stage codegen. Integer addition is commutative,
    so the row-local gram fold equals :func:`nb_score`'s bucket-count
    dot product EXACTLY (q242 locks the twin against q238's oracle).

    This is the shape a STREAMING gate needs (no groupBy → no state
    store → append-mode-safe) and what a 100 TB scan wants anyway
    (the broadcast join disappears entirely).

    Returns a struct column ``(pred, iscore, score)``; tie-break
    smallest label, identical to :func:`nb_classify`."""
    class_rows = sorted(
        fitted["classes"].collect(), key=lambda r: r[label_col]
    )
    if not class_rows:
        raise ValueError("nb_classify_expr: empty classes table")
    n_entries = buckets * len(class_rows)
    if n_entries > _LITERAL_MODEL_MAX_ENTRIES:
        raise ValueError(
            f"nb_classify_expr: {n_entries} literal model entries "
            f"(buckets={buckets} × {len(class_rows)} classes) exceeds "
            f"{_LITERAL_MODEL_MAX_ENTRIES} — too large for a plan "
            "literal; use nb_score/nb_classify (broadcast join) instead"
        )
    deltas: dict = {
        r[label_col]: [0] * buckets for r in class_rows
    }
    for r in fitted["model"].collect():
        deltas[r[label_col]][r["bucket"]] = int(r["idelta"])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
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
    grams = F.filter(F.concat(toks, bigrams), lambda g: g != "")
    tot = F.size(grams)

    def bucket_of(g):
        return (
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
            % buckets
        ).cast("int")

    scored = []
    for r in class_rows:
        arr = F.lit(deltas[r[label_col]])
        isc = (
            F.lit(int(r["iprior"]))
            + tot.cast("long") * F.lit(int(r["illw0"]))
            + F.aggregate(
                grams,
                F.lit(0).cast("long"),
                lambda acc, g: acc
                + F.element_at(arr, bucket_of(g) + 1).cast("long"),
            )
        )
        scored.append(
            F.struct(
                (-isc).alias("nis"), F.lit(r[label_col]).alias("lbl")
            )
        )
    best = F.element_at(F.array_sort(F.array(*scored)), 1)
    iscore = -best.getField("nis")
    return F.struct(
        best.getField("lbl").alias("pred"),
        iscore.alias("iscore"),
        (iscore.cast("double") / F.lit(float(scale))).alias("score"),
    )


def stream_quality_gate(
    sdf: DataFrame,
    fitted: dict[str, DataFrame],
    keep: Sequence[str],
    text_col: str = "text",
    buckets: int = 4096,
    scale: int = 1_000_000,
    label_col: str = "label",
) -> DataFrame:
    """STREAMING classifier gate: keep only documents whose predicted
    class is in ``keep`` — the fastText-filter-at-ingest shape (CCNet
    drops non-target languages, GPT-3 drops low-quality pages, at the
    crawl firehose). Entirely STATELESS (the :func:`nb_classify_expr`
    row-local scorer — no watermark, no state store, append-mode-safe):
    the model rides as a plan literal and the stream is gated at scan
    parallelism. Emits ``pred`` / ``score`` audit columns alongside
    the input columns. Works identically on a batch frame (stream ==
    batch is exact — the expression is row-local)."""
    keep = list(keep)
    if not keep:
        raise ValueError("stream_quality_gate: keep must be non-empty")
    cls = nb_classify_expr(fitted, text_col, buckets, scale, label_col)
    return (
        sdf.withColumn("pred", cls.getField("pred"))
        .withColumn("score", cls.getField("score"))
        .filter(F.col("pred").isin(keep))
    )
