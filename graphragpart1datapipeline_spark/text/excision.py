"""Copied-region EXCISION — the rewrite step of exact-substring
training-data dedup (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better"): detect cross-document copied regions
(winnowing diagonals, q169) and REMOVE them from the later document,
keeping the first occurrence. The output is the deduplicated corpus a
pretraining pipeline actually feeds the tokenizer, plus the
bytes-removed accounting a data audit needs.

Semantics: spans come from
:func:`..text.analysis.winnow_copy_spans` (id_a < id_b); the
KEEP-FIRST policy removes the matched token range from the ``id_b``
side only, so one canonical copy always survives and the operation is
idempotent at the span level. A selected span (b_start..b_end over
k-gram positions) covers tokens b_start .. b_end + k - 1; overlapping
ranges from different partners merge by plain position-set union
(explode + distinct), which is exact and avoids interval-merge
windowing entirely. Excision happens in the winnowing-normalized
token space (lowercase, [a-z0-9]+ tokens) — the same normalization
the detector hashed, so removed == detected by construction.

Scale shape: ranges are span-count-sized (tiny next to the corpus);
the position explode is bounded by removed-token volume; the rewrite
is one anti-join on (doc, pos) against the posexploded token stream
plus one sorted-struct re-aggregation per touched doc — untouched
documents take the left-anti fast path and are never re-tokenized
into rows. No cross product anywhere (the detector is the bucketed
fingerprint join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import winnow_copy_spans


def _norm_tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )


def excise_copy_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_postings: int | None = 50,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Rewrite the corpus with detected copied regions removed from
    the later (``id_b``) document. Returns
    (``id_col``, clean_text, n_tokens, n_removed) for EVERY input
    document — untouched docs carry their full normalized token stream
    and n_removed = 0.

    ``spans``: pass a precomputed :func:`winnow_copy_spans` frame
    (e.g. persisted from the detection run) to skip re-detection;
    it must use the same ``k``.
    """
    if spans is None:
        spans = winnow_copy_spans(
            df,
            text_col,
            id_col,
            k=k,
            w=w,
            min_shared=min_shared,
            max_postings=max_postings,
        )
    remove = (
        spans.select(
            F.col("id_b").alias(id_col),
            F.explode(
                F.sequence(
                    F.col("b_start"), F.col("b_end") + F.lit(k - 1)
                )
            ).alias("pos"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(_norm_tokens(text_col)).alias("pos", "tok"),
    )
    kept = toks.join(remove, [id_col, "pos"], "left_anti")
    rewritten = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "tok"))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        df.select(
            F.col(id_col), F.size(_norm_tokens(text_col)).alias("n_tokens")
        )
        .join(rewritten, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )
