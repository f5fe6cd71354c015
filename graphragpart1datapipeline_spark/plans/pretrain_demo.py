"""End-to-end LLM pretraining data-prep pipeline composed from the
engine's training-data operators — the 100 TB curation DAG the
north-star extensions exist for:

    read → quality gate (language/quality/repetition) → exact dedup →
    repeated-passage removal (sub-document dedup) → near-dup dedup
    (MinHash+LSH survivors) → eval decontamination → domain-mixture
    rebalancing → leakage-safe split assignment → deterministic shard
    shuffle → sequence packing

Every stage is individually oracle-verified (COVERAGE.md: q20/q22/q23/
q85/q55/q62/q75/q79/q87/q78/q76); this module verifies they COMPOSE, with each
stage a pure DataFrame → DataFrame function on the previous one. Every
keep/route decision downstream of the filters is an md5-bucket pure
function of the row id, so the ENTIRE pipeline output — which documents
survive, which shard and sequence each lands in — is reproducible
across runs, cluster sizes, and engines. That is the property a
pretraining data pipeline actually needs: re-running curation after a
crawl increment must not silently reshuffle what the last run kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup import (
    decontaminate,
    exact_dedup,
    leakage_safe_split,
    minhash_lsh_dedup,
    minhash_signatures,
    remove_repeated_passages,
)
from ..dedup.minhash import lsh_candidate_pairs
from ..dedup.ngram import ngram_jaccard_on_pairs
from ..operators import (
    global_shuffle_shards,
    pack_sequences,
    rebalance_to_weights,
)
from ..sources import read_table
from ..text.analysis import language_id, quality_score, repetition_signals
from .pipeline import Pipeline

DEFAULT_MIX = {"en": 0.25, "zh": 0.25, "es": 0.25, "de": 0.125, "fr": 0.125}


def build_pretrain_pipeline(
    sf_dir: str,
    target_mix: dict[str, float] | None = None,
    quality_min: float = 0.2,
    jaccard_threshold: float = 0.7,
    n_shards: int = 16,
    capacity: int = 512,
    dsir_frac: float | None = None,
    classifier_keep: list[str] | None = None,
    html_input: bool = False,
) -> Pipeline:
    """``dsir_frac``: when set, insert a DSIR data-selection stage
    (text/dsir.py) between decontamination and mixture rebalancing —
    keep only the top-``dsir_frac`` most target-like documents (target
    = the deterministic doc_id % 17 == 2 curated slice, q230's rule).
    ``None`` (default) skips the stage; the rest of the DAG is
    unchanged either way.

    ``classifier_keep``: when set, insert the NB classifier gate
    (text/classify.py — the CCNet fastText language filter / GPT-3
    quality filter slot) right after the heuristic quality gate: the
    classifier trains on the deterministic doc_id % 17 == 2 labeled
    slice (lang as the label) and only documents whose PREDICTED
    class is in the list pass. Uses the row-local plan-literal scorer,
    so the gate fuses into the scan like the other quality filters.

    ``html_input``: when True, the corpus ``text`` column is raw HTML
    (the real-crawl shape — the reference sidesteps this by fetching
    Wikipedia plaintext) and an EXTRACTION stage (text/html.py
    html_to_text, q247's oracle-locked rule chain) runs first, before
    any quality/dedup pass reads the text; schema is identical with
    the stage on or off."""
    p = Pipeline()
    mix = DEFAULT_MIX if target_mix is None else target_mix

    @p.stage("documents")
    def documents(spark: SparkSession) -> DataFrame:
        return read_table(spark, sf_dir, "documents")

    gate_dep = "documents"
    if html_input:
        gate_dep = "extracted"

        @p.stage("extracted", deps=["documents"])
        def extracted(spark: SparkSession, docs: DataFrame) -> DataFrame:
            # crawl HTML -> plain text before anything reads the text;
            # a pure row-local regexp chain, fuses into the scan
            from ..text.html import html_to_text

            return docs.withColumn("text", html_to_text("text"))

    @p.stage("quality_gated", deps=[gate_dep])
    def quality_gated(spark: SparkSession, docs: DataFrame) -> DataFrame:
        # row-local signals only — all three filters fuse into the scan
        sig = repetition_signals(docs.select("doc_id", "text"), "text", "doc_id")
        gated = (
            docs.join(sig, "doc_id")
            .filter(F.col("text").isNotNull())
            .filter(language_id("text").isNotNull())
            .filter(quality_score("text") >= quality_min)
            .filter(F.col("dup_line_frac") <= 0.5)
        )
        return gated.select(docs.columns)

    dedup_dep = "quality_gated"
    if classifier_keep is not None:
        dedup_dep = "classifier_gated"

        @p.stage("classifier_gated", deps=["quality_gated"])
        def classifier_gated(spark: SparkSession, docs: DataFrame) -> DataFrame:
            # the learned filter after the heuristic one: NB trained on
            # the deterministic curated slice, applied as a row-local
            # plan-literal expression (fuses into the scan); the audit
            # columns are dropped so the downstream schema is identical
            # with the stage on or off
            from ..text.classify import nb_train, stream_quality_gate

            seed_slice = docs.filter(F.col("doc_id") % 17 == 2).select(
                "doc_id", "text", F.col("lang").alias("label")
            )
            fitted = nb_train(seed_slice, buckets=512)
            return stream_quality_gate(
                docs, fitted, classifier_keep, buckets=512
            ).drop("pred", "score")

    @p.stage("exact_deduped", deps=[dedup_dep])
    def exact_deduped(spark: SparkSession, docs: DataFrame) -> DataFrame:
        # cheapest cut first: one hash-groupBy removes byte-identical rows
        return exact_dedup(docs, text_col="text", id_col="doc_id")

    @p.stage("passage_cleaned", deps=["exact_deduped"])
    def passage_cleaned(spark: SparkSession, docs: DataFrame) -> DataFrame:
        # sub-document dedup: strip passages repeated corpus-wide
        # (licence blocks, navigation chrome); documents reduced to
        # nothing but boilerplate drop out of the corpus here
        cleaned = remove_repeated_passages(
            docs.select("doc_id", "text"), window=12, min_occurrences=4
        )
        keep = cleaned.filter(F.col("text") != "").select(
            "doc_id", F.col("text").alias("__clean_text")
        )
        return (
            docs.drop("text")
            .join(keep, "doc_id")
            .withColumnRenamed("__clean_text", "text")
        )

    @p.stage("near_deduped", deps=["passage_cleaned"])
    def near_deduped(spark: SparkSession, docs: DataFrame) -> DataFrame:
        # lazy stage materialization: everything downstream (decontam
        # 5-gram join, the split's second LSH pass, shard/pack) fans out
        # from this frame several times; without a checkpoint every
        # action replays the whole quality→dedup prefix. Production
        # would persist the stage table (Pipeline checkpoint=...); the
        # demo keeps it in-memory.
        return minhash_lsh_dedup(
            docs, "text", "doc_id", jaccard_threshold=jaccard_threshold
        ).localCheckpoint(eager=False)

    @p.stage("decontaminated", deps=["near_deduped"])
    def decontaminated(spark: SparkSession, docs: DataFrame) -> DataFrame:
        # documents sharing any 5-gram with the held-out benchmark
        # subset (same pseudo-benchmark rule as q75) are removed
        bench = docs.filter(F.col("doc_id") % 41 == 0)
        corpus = docs.filter(F.col("doc_id") % 41 != 0)
        leaked = decontaminate(
            corpus, bench, text_col="text", id_col="doc_id", n=5, min_matches=1
        ).select("doc_id")
        return corpus.join(leaked, "doc_id", "left_anti")

    rebal_dep = "decontaminated"
    if dsir_frac is not None:
        rebal_dep = "dsir_selected"

        @p.stage("dsir_selected", deps=["decontaminated"])
        def dsir_selected(spark: SparkSession, docs: DataFrame) -> DataFrame:
            # importance-resampling cut: keep the documents that look
            # most like the curated target slice; the weight column is
            # dropped so the downstream schema is identical with the
            # stage on or off
            from ..text.dsir import dsir_select

            target = docs.filter(F.col("doc_id") % 17 == 2).select("text")
            return dsir_select(
                docs, target, frac=dsir_frac, id_col="doc_id",
                text_col="text",
            ).drop("weight")

    @p.stage("rebalanced", deps=[rebal_dep])
    def rebalanced(spark: SparkSession, docs: DataFrame) -> DataFrame:
        return rebalance_to_weights(
            docs, stratum_col="lang", targets=mix, id_col="doc_id"
        )

    @p.stage("split_assigned", deps=["rebalanced"])
    def split_assigned(spark: SparkSession, docs: DataFrame) -> DataFrame:
        # dedup removed duplicates ABOVE the threshold; pairs below it
        # can still leak eval content, so split by near-dup component
        # at a looser threshold — components co-travel by construction
        sigs = minhash_signatures(docs, "text", "doc_id")
        pairs = lsh_candidate_pairs(sigs, "doc_id", bands=4)
        verified = (
            ngram_jaccard_on_pairs(pairs, docs, "text", "doc_id")
            .filter(F.col("jaccard") >= jaccard_threshold / 2)
            .select("a", "b")
        )
        return leakage_safe_split(
            docs, verified, id_col="doc_id"
        ).localCheckpoint(eager=False)

    @p.stage("sharded", deps=["split_assigned"])
    def sharded(spark: SparkSession, docs: DataFrame) -> DataFrame:
        # shards shuffle the TRAIN split only; val/test stay aside
        return global_shuffle_shards(
            docs.filter(F.col("split") == "train"), "doc_id",
            n_shards=n_shards,
        )

    @p.stage("packed", deps=["sharded"])
    def packed(spark: SparkSession, docs: DataFrame) -> DataFrame:
        counted = docs.select(
            "doc_id",
            "lang",
            "shard",
            "pos",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("tokens"),
        )
        seqs = pack_sequences(
            counted.select("doc_id", "tokens"),
            id_col="doc_id",
            token_count_col="tokens",
            capacity=capacity,
            n_streams=n_shards // 2,
        )
        return counted.join(seqs.drop("tokens"), "doc_id")

    return p
