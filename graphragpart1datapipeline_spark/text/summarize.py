"""Deterministic EXTRACTIVE summarization — the in-container default
behind the T9 generation seam (text/llm.py).

The reference generates per-community summaries with a local LLM
(src/data_pipeline/defs/assets/generate_community_summaries.py:86-144
via utils/llm_helpers.py:45-112) — model-coupled and unreproducible.
This module supplies the engine-native fallback: TextRank (Mihalcea &
Tarau 2004) over the community's sentence graph, built entirely from
the engine's exact-integer PageRank so the selection is a pure
function of the text — bit-reproducible, SQL-replayable (q222), and
distributed:

1. sentence split (``[.!?]+`` boundaries, original positions kept),
2. per-sentence token SET (lowercased whitespace tokens, stopwords
   dropped),
3. sentence-pair edges via the shared-token inverted index — pairs
   are generated ONLY through shared words (token join + count), never
   an all-pairs product; the integer overlap count is the edge weight
   (the classic length-log normalization would put floats in the
   recurrence — the integer-weight variant keeps every iteration
   exactly replayable),
4. weighted exact-integer PageRank (graph/pagerank.py, damping 17/20,
   scaled-long ranks),
5. top-``m`` sentences per group by (rank desc, doc asc, position
   asc); sentences sharing no token with any other (rank row absent)
   score 0 — an all-isolated group degrades to the leading-``m``
   baseline deterministically.

Scale shape: everything is group-local; the only quadratic risk is a
group whose sentences share hot tokens, which ``max_group_sentences``
bounds LOUDLY (in-plan raise, mirroring vector/mmr.py's candidate
guard) — community summarization is a rollup-stage operator over
bounded communities, not a corpus-wide pair scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sentence_table", "textrank_summary"]


def sentence_table(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group_sentences: int | None = 2000,
) -> DataFrame:
    """(group, id, sent_pos, sentence) — split on ``[.!?]+``, 1-based
    original positions, whitespace-trimmed, empties dropped. With
    ``max_group_sentences`` set, a group exceeding the bound raises
    in-plan (the pair stage downstream is quadratic in the worst case
    — refuse loudly instead of melting). The guard is attached to
    EVERY output column, so no projection of the result can prune it
    away — a caller selecting only (group, id) still trips the raise
    the moment any row of an oversized group is evaluated."""
    sent = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"[.!?]+")).alias(
            "pos0", "raw"
        ),
    ).select(
        "group",
        "id",
        (F.col("pos0") + 1).alias("sent_pos"),
        F.trim(F.col("raw")).alias("sentence"),
    ).filter(F.col("sentence") != "")
    if max_group_sentences is not None:
        wg = Window.partitionBy("group")
        ok = F.count(F.lit(1)).over(wg) <= max_group_sentences
        err = F.raise_error(
            F.concat(
                F.lit("textrank_summary: group "),
                F.col("group").cast("string"),
                F.lit(
                    f" exceeds max_group_sentences={max_group_sentences}"
                    " — the sentence-pair stage is worst-case quadratic"
                    " per group; pre-slice the community or raise the"
                    " bound explicitly"
                ),
            )
        )
        # one window count feeds four guards (same frame — Catalyst
        # evaluates the Window once); guarding every column means
        # column pruning can never drop the raise with the data
        sent = sent.select(
            *(F.when(ok, F.col(c)).otherwise(err).alias(c) for c in sent.columns)
        )
    return sent


def textrank_summary(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = 3,
    iters: int = 3,
    min_overlap: int = 1,
    stopwords: frozenset[str] | None = None,
    scale: int = 10**12,
    max_group_sentences: int | None = 2000,
) -> DataFrame:
    """Top-``m`` TextRank sentences per ``group_col`` — the
    deterministic extractive stand-in for the reference's LLM
    community summaries. Returns (``group_col``, ``id_col``,
    ``sent_pos``, ``sentence``, ``rank``, ``sel_rank``) with ``rank``
    the scaled-long PageRank score (0 for isolated sentences) and
    ``sel_rank`` 1..m by (rank desc, id asc, sent_pos asc).

    ``min_overlap``: minimum shared-token count for a sentence edge
    (≥ 2 thins stop-ish connections when no stopword list is given).
    ``stopwords`` defaults to the engine's English list
    (text/analysis.py STOPWORDS["en"])."""
    from ..graph.pagerank import pagerank
    from .analysis import STOPWORDS

    if m < 1:
        raise ValueError(f"textrank_summary: m must be >= 1, got {m}")
    if min_overlap < 1:
        raise ValueError(
            f"textrank_summary: min_overlap must be >= 1, got {min_overlap}"
        )
    sw = sorted(STOPWORDS["en"] if stopwords is None else stopwords)
    # eager deliberately: sent feeds both the token/pair/PageRank chain
    # and the final rank join — parallel stages in the consuming job
    # would race to compute a lazy checkpoint's partitions (round-11
    # measured decision; see OPTIMIZATION_r11.md)
    sent = sentence_table(
        df, group_col, id_col, text_col, max_group_sentences
    ).localCheckpoint(eager=True)

    # LENGTH-PREFIXED node key: a bare "g:id:pos" concat is ambiguous
    # when group/id values themselves contain ':' (two distinct
    # sentences could collide onto one PageRank node and pollute ranks
    # across groups); the length prefixes make the decoding unique for
    # any string content
    g = F.col("group").cast("string")
    i = F.col("id").cast("string")
    node = F.concat(
        F.length(g).cast("string"), F.lit(":"), g, F.lit(":"),
        F.length(i).cast("string"), F.lit(":"), i, F.lit(":"),
        F.col("sent_pos").cast("string"),
    )
    toks = sent.select(
        "group",
        node.alias("node"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("sentence")), r"\s+"),
                    lambda t: (t != "") & ~t.isin(sw),
                )
            )
        ).alias("tok"),
    )
    # MEASURED DECISION (round-11, guide §1): a collect_set +
    # row-local pair-generation rewrite (the cooccurrence_edges
    # pattern) was tried here and ran ~25-40% SLOWER at sf0.1 than
    # this self-join — the node keys are long composite strings, and
    # materializing k² string-pair structs per (group, tok) array row
    # loses to the streamed codegen join + immediate partial
    # aggregation. Kept the join.
    a = toks.select("group", "tok", F.col("node").alias("na"))
    b = toks.select("group", "tok", F.col("node").alias("nb"))
    pairs = (
        a.join(b, ["group", "tok"])
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_overlap)
    )
    edges = pairs.select(
        F.col("na").alias("src"), F.col("nb").alias("dst"), "w"
    ).unionByName(
        pairs.select(
            F.col("nb").alias("src"), F.col("na").alias("dst"), "w"
        )
    )
    ranks = pagerank(edges, iters=iters, scale=scale, weight_col="w")

    scored = sent.join(
        ranks.withColumnRenamed("id", "__node"),
        node == F.col("__node"),
        "left",
    ).select(
        "group",
        "id",
        "sent_pos",
        "sentence",
        F.coalesce("rank", F.lit(0)).cast("long").alias("rank"),
    )
    w = Window.partitionBy("group").orderBy(
        F.desc("rank"), F.asc("id"), F.asc("sent_pos")
    )
    return (
        scored.withColumn("sel_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sel_rank") <= m)
        .select(
            F.col("group").alias(group_col),
            F.col("id").alias(id_col),
            "sent_pos",
            "sentence",
            "rank",
            "sel_rank",
        )
    )
