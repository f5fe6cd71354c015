#!/usr/bin/env python
"""Empirical scaling check for the scale-path operators.

Generates a synthetic corpus K× the size of $SPARK_GRAFT_SF_DIR's
documents/embeddings tables (in /tmp — never touches the source data),
runs the scale-path representatives at 1× and K×, and prints one JSON
line with the timing ratio per operator. A scale-correct plan shows a
ratio near K (linear work, constant parallel overhead); a quadratic
plan shows ~K².

The K× corpus is NOT a verbatim replication: each copy gets a distinct
id range and a copy-marker token appended to the text (so near-dup
structure survives but exact-dup collapse does not trivialize dedup),
and embedding copies are rotated by copy index so LSH buckets stay
balanced.

Usage: python scale_check.py [K] [--assert]   (default K=10)

With ``--assert`` the script exits non-zero if any operator's K×/1×
wall-clock ratio exceeds its bound in ``SCALE_BOUNDS`` — a CI-style
guard so a plan regression (a new shuffle, a lost broadcast, a
pair-space blowup) fails loudly instead of drifting. Bounds are ~2×
the measured round-2 ratios at K=10 to absorb ambient variance; a
quadratic regression shows ~K× the measured ratio and still trips.

Round 5: the six pair-space operators with counted-work probes
(:func:`pair_counters`) assert on ``pair_ratio`` — the K×/1×
CANDIDATE-pair count, measured on a SALTED companion corpus whose
true pair structure is exactly K× the base (per-copy token bijection)
— against ``PAIR_BOUNDS_FACTOR[op] · K``; their wall ratio is
recorded but informational (wall on bursty bucket-cap work swung
1.5× run-to-run and produced round-4's false watch item).

Round 10: the remaining WALL-ratio asserts are LOAD-GATED. Wall
bounds swing ~1.5× with box state (round-9's repeated_passages
"violation" at 8.32 vs 7.5 happened on a slow-session box while the
counted pair ratios — the module's real signal — were clean at
3.1–4.0). When the load sentinel taken at block start shows
``load1 >= WALL_ASSERT_MAX_LOAD1`` the wall bounds are recorded as
informational (``wall_asserts: "skipped_load"`` in the payload) and
only the exactly-reproducible pair-count bounds can raise
violations; on an idle box the wall asserts stay enforced.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from graphragpart1datapipeline_spark.session import get_spark
from graphragpart1datapipeline_spark.sources import read_table


def build_scaled(spark, sf_dir: str, k: int, out_dir: str) -> None:
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    copies = spark.range(k).withColumnRenamed("id", "__copy")
    n_docs = docs.count()
    n_vecs = emb.count()
    (
        docs.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("__copy") * n_docs)
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" copymark"), F.col("__copy")),
        )
        .drop("__copy")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )
    # salted companion corpus for the COUNTED-WORK pair probes: every
    # TOKEN gets the copy id suffixed ("foo" → "fooc2"), a per-copy
    # BIJECTION on the vocabulary — within a copy the shingle/token
    # similarity structure is exactly isomorphic to the base corpus,
    # across copies every shingle differs — so the true pair structure
    # of the K× table is exactly K× the base's, which is what lets
    # pair_ratio assert linearity. (An interleaved shared marker token
    # would instead make unrelated docs collide within a copy — the
    # probes would measure the salt, not the plan.) The wall-clock ops
    # keep the UNSALTED corpus above (cross-copy near-dup structure is
    # realistic for dedup wall cost).
    (
        docs.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("__copy") * n_docs)
        .withColumn(
            "text",
            F.regexp_replace(
                F.col("text"),
                r"(\S+)",
                F.concat(F.lit("$1c"), F.col("__copy").cast("string")),
            ),
        )
        .drop("__copy")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents_salted.parquet")
    )
    (
        emb.crossJoin(copies)
        .withColumn("vec_id", F.col("vec_id") + F.col("__copy") * n_vecs)
        .withColumn(
            "embedding",
            # rotate by copy index so replicas are not bit-identical
            F.concat(
                F.slice(F.col("embedding"), F.col("__copy") + 1, F.lit(64)),
                F.slice(F.col("embedding"), 1, F.col("__copy")),
            ),
        )
        .drop("__copy")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )



def _docs_df(spark, base):
    return read_table(spark, base, "documents")


def _nb_probe(spark, docs):
    """Train on the even half, classify the odd half — the q238 shape
    at probe scale."""
    from graphragpart1datapipeline_spark.text.classify import (
        nb_classify,
        nb_train,
    )

    d = docs()
    train = d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text", F.col("lang").alias("label")
    )
    test = d.filter(F.col("doc_id") % 2 == 1)
    return nb_classify(test, nb_train(train, buckets=512), buckets=512)


def _audio_probe(spark, emb):
    """Embeddings reshaped to 16×4 frames, shingled and offset-matched
    — the q242 shape at probe scale (min_matches=1 so the probe counts
    every alignment the join produces)."""
    from graphragpart1datapipeline_spark.multimodal.audio import (
        audio_match_pairs,
        frame_shingle_fingerprints,
    )

    e = emb()
    v = F.col("embedding").cast("array<double>")
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(15)), lambda s: F.slice(v, s * 4 + 1, 4)
    )
    clips = e.select("vec_id", frames.alias("frames"))
    fps = frame_shingle_fingerprints(
        clips, "frames", "vec_id", shingle=3, quant=2.0
    )
    return audio_match_pairs(fps, "vec_id", min_matches=1, max_df=16)


def _docs_salted_df(spark, base):
    """The pair-probe corpus: the salted companion when it exists (K×
    dirs), else the raw documents (1× base — no copies, no salt
    needed). See build_scaled for why the probes need it."""
    import os as _os

    p = f"{base}/documents_salted.parquet"
    if _os.path.exists(p):
        return spark.read.parquet(p)
    return read_table(spark, base, "documents")


def _fuzzy_names_df(spark, base):
    # even/odd docs share an md5 stem, the odd copy mutated in one
    # char — distinct values and true pairs both grow linearly.
    # 24-char stems (not 12): with d=2 the PassJoin segments are
    # len/3-char keys, and at 12 chars the 16^4 4-char hex keyspace
    # SATURATES as values grow (~50k values → ~0.8 index entries and
    # ~11 probes per key), making ACCIDENTAL candidate collisions
    # quadratic even though true pairs stay linear (measured 64× at
    # K=10). 8-char segments (16^8 keys) keep expected collisions ≈ 0,
    # so the candidate stream tracks the true pair structure — which
    # is also the realistic regime: entity strings are not uniform
    # fixed-length 12-char hex.
    return _docs_df(spark, base).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.substring(
                F.md5((F.col("doc_id") - F.col("doc_id") % 2)
                      .cast("string")), 1, 24),
        ).otherwise(
            F.concat(
                F.substring(
                    F.md5((F.col("doc_id") - F.col("doc_id") % 2)
                          .cast("string")), 1, 23),
                F.lit("q"),
            )
        ).alias("name"),
    )


def _entity_names_df(spark, base):
    d = _docs_df(spark, base).select("doc_id")
    n = max(d.count(), 1)
    shared = (F.col("doc_id") - F.col("doc_id") % 2).cast("string")
    tok = F.when(
        F.col("__r") < 5,
        F.conv(
            F.substring(
                F.md5(F.concat(shared, F.lit(":"), "__r")), 1, 8
            ), 16, 10,
        ).cast("long") % n,
    ).otherwise(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":u"))),
                1, 8,
            ), 16, 10,
        ).cast("long") % n + n
    )
    return (
        d.crossJoin(spark.range(6).withColumnRenamed("id", "__r"))
        .select("doc_id", F.concat(F.lit("t"), tok.cast("string")).alias("t"))
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("t")).alias("etext"))
    )


def ops(spark, base: str, extra_bits: int = 0):
    """The scale-path representatives, each ending in a full noop write.

    ``extra_bits``: LSH bucket width grows with log2(corpus growth) so
    per-bucket occupancy — and with it per-bucket quadratic pair work —
    stays constant. That is the documented operating rule for these
    operators at scale (fixed bits would grow pair work K²/2^bits).
    """
    from graphragpart1datapipeline_spark.dedup import (
        embedding_near_dup_pairs,
        exact_dedup,
        minhash_lsh_dedup,
        minhash_lsh_incremental,
        remove_repeated_passages,
    )
    from graphragpart1datapipeline_spark.operators import kmv_distinct
    from graphragpart1datapipeline_spark.graph import pagerank
    from graphragpart1datapipeline_spark.graph.communities import (
        label_propagation_communities,
    )
    from graphragpart1datapipeline_spark.operators import (
        global_shuffle_shards,
        negative_ring_sample,
    )
    from graphragpart1datapipeline_spark.text.analysis import (
        bm25_topk,
        tfidf_top_terms,
    )
    from graphragpart1datapipeline_spark.graph.triangles import triangle_counts
    from graphragpart1datapipeline_spark.operators.layout import (
        zorder_bucket_stats,
    )
    from graphragpart1datapipeline_spark.text.lm import bigram_lm_score
    from graphragpart1datapipeline_spark.vector.search import knn_join_blocked
    from graphragpart1datapipeline_spark.dedup.entity import (
        set_similarity_join,
        sorted_neighborhood_pairs,
    )
    from graphragpart1datapipeline_spark.dedup.splits import (
        weighted_poisson_sample,
    )
    from graphragpart1datapipeline_spark.operators.sketches import heavy_hitters
    from graphragpart1datapipeline_spark.graph.linkpred import (
        link_prediction_scores,
    )
    from graphragpart1datapipeline_spark.dedup.editdist import (
        levenshtein_self_join,
    )
    from graphragpart1datapipeline_spark.dedup.incremental import (
        levenshtein_index,
        levenshtein_join_incremental,
        set_similarity_index,
        set_similarity_join_incremental,
    )
    from graphragpart1datapipeline_spark.operators import salted_join_auto
    from graphragpart1datapipeline_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_merge,
        quantile_sketch_query,
    )
    from graphragpart1datapipeline_spark.vector.search import (
        multi_query_topk,
    )
    from graphragpart1datapipeline_spark.graph import leiden_communities
    from graphragpart1datapipeline_spark.operators.relational import (
        mad_outliers,
    )
    from graphragpart1datapipeline_spark.text.analysis import (
        phrase_search,
        positional_postings,
        token_diversity,
    )
    from graphragpart1datapipeline_spark.dedup.semantic import (
        semdedup_index,
        semdedup_upsert,
    )
    from graphragpart1datapipeline_spark.text.summarize import (
        textrank_summary,
    )
    from graphragpart1datapipeline_spark.text.contamination import (
        contamination_report,
        ngram_hash_set,
    )
    from graphragpart1datapipeline_spark.text.dsir import dsir_weights
    from graphragpart1datapipeline_spark.vector.pq import (
        pq_encode,
        pq_train,
    )

    def docs():
        return _docs_df(spark, base)

    def _fuzzy_names():
        return _fuzzy_names_df(spark, base)

    def emb():
        return read_table(spark, base, "embeddings")

    def _entity_names():
        return _entity_names_df(spark, base)

    def _pagerank():
        # synthetic doc→doc graph: md5-derived endpoints, |E| = 4·|docs|
        d = docs().select("doc_id")
        n = d.count()
        edges = (
            d.crossJoin(spark.range(4).withColumnRenamed("id", "__r"))
            .select(
                F.col("doc_id").cast("string").alias("src"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat("doc_id", F.lit(":"), "__r")), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long")
                    % n
                ).cast("string").alias("dst"),
            )
        )
        return pagerank(edges, iters=3)

    def _triangles():
        # md5 graph with constant expected degree (~16): node space n/4,
        # |E| = 4n — wedge work grows linearly with the corpus
        d = docs().select("doc_id")
        n = max(d.count() // 4, 1)
        edges = (
            d.crossJoin(spark.range(4).withColumnRenamed("id", "__r"))
            .select(
                (F.col("doc_id") % n).alias("src"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat("doc_id", F.lit(":"), "__r")), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long")
                    % n
                ).alias("dst"),
            )
        )
        return triangle_counts(edges)

    return {
        "exact_dedup": lambda: exact_dedup(docs()),
        "minhash_lsh": lambda: minhash_lsh_dedup(
            docs(), jaccard_threshold=0.7, max_bucket_size=200
        ),
        "minhash_incremental": lambda: minhash_lsh_incremental(
            docs().filter(F.col("doc_id") % 10 == 0),
            docs().filter(F.col("doc_id") % 10 != 0),
        ),
        "embedding_near_dup_lsh": lambda: embedding_near_dup_pairs(
            emb(), id_col="vec_id", threshold=0.3,
            bucket_bits=4 + extra_bits, dim=64,
        ),
        "knn_join_blocked": lambda: knn_join_blocked(
            emb(), k=8, id_col="vec_id", bits=4 + extra_bits, dim=64
        ),
        "tfidf": lambda: tfidf_top_terms(docs(), k=5),
        "repeated_passages": lambda: remove_repeated_passages(
            docs().select("doc_id", "text"), window=12, min_occurrences=2
        ),
        "kmv_distinct": lambda: kmv_distinct(
            docs(), value_col="text", group_cols=["lang"], k=256
        ),
        "global_shuffle_shards": lambda: global_shuffle_shards(
            docs().select("doc_id"), "doc_id", n_shards=64
        ),
        "pagerank": _pagerank,
        "label_propagation": lambda: label_propagation_communities(
            docs()
            .select("doc_id")
            .crossJoin(spark.range(4).withColumnRenamed("id", "__r"))
            .select(
                F.col("doc_id").cast("string").alias("src"),
                F.conv(
                    F.substring(
                        F.md5(F.concat("doc_id", F.lit(":"), "__r")), 1, 8
                    ),
                    16,
                    10,
                ).cast("string").alias("dst"),
            ),
            iters=3,
        ),
        "negative_ring_sample": lambda: negative_ring_sample(
            docs(), "doc_id", k=3, n_shards=256
        ),
        "bm25_topk": lambda: bm25_topk(
            docs(), ["spark", "merge", "window"], k=100, log_idf=False
        ),
        "bigram_lm": lambda: bigram_lm_score(docs()),
        "triangle_counts": _triangles,
        "zorder_stats": lambda: zorder_bucket_stats(
            docs(), ["doc_id", "n_chars"], bits=16, bucket_bits=6
        ),
        # Entity keys are SYNTHESIZED with vocabulary proportional to the
        # corpus (like the md5 graphs above): per-token bucket occupancy
        # stays constant as the corpus grows, which is the documented
        # operating regime for prefix-filter ER at scale. Even/odd doc
        # pairs share 5 of 6 tokens (J=5/7 >= 3/5), so the true-pair
        # count also grows linearly.
        "set_similarity": lambda: set_similarity_join(
            _entity_names(), "doc_id", "etext", t_num=3, t_den=5
        ),
        "sorted_neighborhood": lambda: sorted_neighborhood_pairs(
            docs().select(
                "doc_id", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8).alias("k")
            ),
            "doc_id", "k", window=5, max_distance=2,
            bucket_expr=F.substring(F.col("key"), 1, 2),
        ),
        "heavy_hitters": lambda: heavy_hitters(
            docs().select(
                F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
            ),
            "w", k=50,
        ),
        "weighted_sample": lambda: weighted_poisson_sample(
            docs().select("doc_id", "n_chars"), "doc_id", "n_chars", 500
        ),
        "phrase_search": lambda: phrase_search(
            positional_postings(docs(), "doc_id", "text"), ["hash", "join"]
        ),
        "token_diversity": lambda: token_diversity(docs()),
        # constant-degree md5 graph (like pagerank's): wedge volume
        # Σ deg² grows linearly with nodes, the linkpred operating regime
        "link_prediction": lambda: link_prediction_scores(
            docs()
            .crossJoin(spark.range(4).withColumnRenamed("id", "__r"))
            .select(
                F.col("doc_id").cast("string").alias("src"),
                F.conv(
                    F.substring(
                        F.md5(F.concat("doc_id", F.lit(":"), "__r")), 1, 8
                    ),
                    16,
                    10,
                ).cast("string").alias("dst"),
            ),
            top_k=50,
        ),
        "mad_outliers": lambda: mad_outliers(
            docs().select("doc_id", "n_chars"), "n_chars"
        ),
        # synthesized names: even/odd docs share an md5 stem, the odd
        # copy mutated in one char — distinct values and true pairs
        # both grow linearly with the corpus (the PassJoin regime)
        # max_segment_bucket mirrors minhash's max_bucket_size=200:
        # the fixed-length bounded-alphabet name space saturates the
        # (l, i, seg) keyspace as values grow, so UNCAPPED PassJoin
        # candidates go quadratic on this data (measured 64x at K=10) —
        # the cap is the documented at-scale operating configuration.
        "fuzzy_join": lambda: levenshtein_self_join(
            _fuzzy_names(), "doc_id", "name", d=2, max_segment_bucket=200,
        ),
        # round-4: incremental ER (new ≡ 0 mod 4 vs the rest through a
        # persisted-index build), auto-salted skew join, distributed
        # Leiden — same synthesized linear regimes as their batch kin
        "set_similarity_incremental": lambda: set_similarity_join_incremental(
            _entity_names().filter(F.col("doc_id") % 4 == 0),
            set_similarity_index(
                _entity_names().filter(F.col("doc_id") % 4 != 0),
                "doc_id", "etext", t_num=3, t_den=5,
            ),
            "doc_id", "etext", t_num=3, t_den=5,
        ),
        "fuzzy_join_incremental": lambda: levenshtein_join_incremental(
            _fuzzy_names().filter(F.col("doc_id") % 4 == 0),
            levenshtein_index(
                _fuzzy_names().filter(F.col("doc_id") % 4 != 0),
                "doc_id", "name", d=2,
            ),
            "doc_id", "name", d=2, max_segment_bucket=200,
        ),
        # one hot key holding ~10% of the fact side; detection + per-key
        # salting must keep the join linear with a bounded straggler
        # batched exact ANN: 8 fixed queries, ONE corpus scan — wall
        # must grow ~linearly with the corpus, never with B×corpus
        "multi_query_topk": lambda: multi_query_topk(
            emb(),
            emb().filter(F.col("vec_id") < 8).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            k=8, id_col="vec_id",
        ),
        # bottom-t quantile sketch: 2-shard build + merge + p50/p90
        # reads — one window pass per shard, sample-sized everything
        # after; linear in the corpus
        "quantile_sketch": lambda: quantile_sketch_query(
            quantile_sketch_merge(
                quantile_sketch_build(
                    docs().filter(F.col("doc_id") % 2 == 0),
                    "doc_id", "doc_id", ["lang"], t=256,
                ).unionByName(
                    quantile_sketch_build(
                        docs().filter(F.col("doc_id") % 2 == 1),
                        "doc_id", "doc_id", ["lang"], t=256,
                    )
                ),
                ["lang"], t=256,
            ),
            [0.5, 0.9], ["lang"],
        ),
        "salted_join_auto": lambda: salted_join_auto(
            docs().select(
                F.when(F.col("doc_id") % 10 == 0, F.lit(0))
                .otherwise(F.col("doc_id")).alias("k"),
                "n_chars",
            ),
            docs().select(
                F.when(F.col("doc_id") % 10 == 0, F.lit(0))
                .otherwise(F.col("doc_id")).alias("k"),
            ).distinct(),
            on="k", threshold_frac=0.05,
        ),
        # round-7: incremental SemDeDup — k scales with the corpus
        # (target_cluster_size=500, the paper's constant-cluster-size
        # rule), increment ≡ 0 mod 4 probes the frozen-centroid index;
        # pair work is bounded by cluster occupancy (counted probe in
        # pair_counters), wall informational
        "semdedup_incremental": lambda: semdedup_upsert(
            semdedup_index(
                emb().filter(F.col("vec_id") % 4 != 0),
                tau=0.3, target_cluster_size=500, iters=1,
            ),
            emb().filter(F.col("vec_id") % 4 == 0),
        )[1],
        # round-7: TextRank extractive summarization in its operating
        # regime — bounded communities (50 docs each), community COUNT
        # grows with the corpus: sentence pairs flow through the
        # shared-token inverted index group-locally, total work linear
        "textrank_summary": lambda: textrank_summary(
            docs().select(
                F.floor(F.col("doc_id") / 50).alias("community"),
                "doc_id",
                "text",
            ),
            group_col="community", m=3, iters=3, min_overlap=1,
            max_group_sentences=500,
        ),
        # round-8: eval decontamination — benchmark slice collapses to
        # a broadcast hash set, corpus side map-only + one doc agg;
        # wall must grow ~linearly with the corpus, never with
        # corpus × benchmark
        "contamination": lambda: contamination_report(
            docs().select("doc_id", "text"),
            ngram_hash_set(
                docs().filter(F.col("doc_id") % 23 == 1).select("text"),
                n=5,
            ),
            n=5, threshold=0.5,
        ),
        # round-8: DSIR weights — bucket-width (512) shuffle + broadcast
        # ratio table over the corpus feature stream; linear
        "dsir_weights": lambda: dsir_weights(
            docs().select("doc_id", "text"),
            docs().filter(F.col("doc_id") % 17 == 2).select("text"),
            buckets=512,
        ),
        # round-8: PQ train+encode — the joint per-subspace Lloyd run
        # (update shuffle m·ksub·dsub rows/partition, corpus-size
        # independent) + map-only encode; linear in the corpus
        "pq_encode": lambda: pq_encode(
            emb(), pq_train(emb(), m=4, ksub=4, iters=1, seed=42)
        ),
        # round-8b: NB train+classify — training shuffles bucket-width
        # counts, scoring is one corpus feature scan + a broadcast
        # model join; wall must grow ~linearly with the corpus
        "nb_classify": lambda: _nb_probe(spark, docs),
        # round-8b: audio offset-histogram match — shingle fingerprints
        # are row-local, the self-join is an exact-hash pigeonhole
        # (distinct clips' quantized windows don't collide), so the
        # candidate stream and wall stay ~linear in the clip count
        "audio_match": lambda: _audio_probe(spark, emb),
        # 2 edges/node keeps the multi-round join volume inside the
        # bench time envelope; the linear-regime conclusion is the same
        "leiden_distributed": lambda: leiden_communities(
            docs()
            .select("doc_id")
            .crossJoin(spark.range(2).withColumnRenamed("id", "__r"))
            .select(
                F.col("doc_id").cast("string").alias("src"),
                F.conv(
                    F.substring(
                        F.md5(F.concat("doc_id", F.lit(":"), "__r")), 1, 8
                    ),
                    16,
                    10,
                ).cast("string").alias("dst"),
            ),
            rounds_per_level=2, levels=2, refine_rounds=1,
        ),
    }



def pair_counters(spark, base: str):
    """Counted-work probes: one DataFrame per pair-space operator whose
    ``count()`` is the operator's CANDIDATE-pair volume (the stream the
    verify stage consumes). Unlike wall clock — which swings 1.5× on
    bursty bucket-cap work (minhash_lsh measured 3.1–4.7 at K=4 across
    runs, round-4 verdict watch item) — the candidate count is a pure
    function of the data, so its 1×/K× ratio is EXACTLY reproducible
    and is what the in-bench assert bounds; wall stays informational
    for counted ops. Configs mirror ops() entry for entry."""
    from graphragpart1datapipeline_spark.dedup import (
        minhash_lsh_dedup,  # noqa: F401  (config source of truth)
    )
    from graphragpart1datapipeline_spark.dedup.minhash import (
        lsh_bucket_table,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from graphragpart1datapipeline_spark.dedup.editdist import (
        levenshtein_self_join,
    )
    from graphragpart1datapipeline_spark.dedup.entity import (
        set_similarity_join,
    )
    from graphragpart1datapipeline_spark.dedup.incremental import (
        levenshtein_index,
        levenshtein_join_incremental,
        set_similarity_index,
        set_similarity_join_incremental,
    )

    def docs():
        return _docs_salted_df(spark, base)

    def _mh_inc_cand():
        new = docs().filter(F.col("doc_id") % 10 == 0)
        corpus = docs().filter(F.col("doc_id") % 10 != 0)
        nb = lsh_bucket_table(minhash_signatures(new))
        cb = lsh_bucket_table(minhash_signatures(corpus))
        return (
            nb.alias("n")
            .join(cb.alias("c"), ["band", "bucket"])
            .select(
                F.col("n.doc_id").alias("a"), F.col("c.doc_id").alias("b")
            )
            .distinct()
        )

    from graphragpart1datapipeline_spark.dedup.semantic import (
        semdedup_index,
        semdedup_upsert,
    )

    def _semdedup_cand():
        emb = read_table(spark, base, "embeddings")
        return semdedup_upsert(
            semdedup_index(
                emb.filter(F.col("vec_id") % 4 != 0),
                tau=0.3, target_cluster_size=500, iters=1,
            ),
            emb.filter(F.col("vec_id") % 4 == 0),
            return_candidates=True,
        )

    return {
        "minhash_lsh": lambda: lsh_candidate_pairs(
            minhash_signatures(docs()), max_bucket_size=200
        ),
        # round-7: incremental SemDeDup candidate stream (new×corpus
        # cluster collisions + new×new, pre-τ) — k grows with the
        # corpus so expected cluster occupancy is constant and the
        # count scales ≈K; kmeans cluster-size skew makes the ratio
        # burstier than the salted-token probes, bounded accordingly
        "semdedup_incremental": _semdedup_cand,
        "minhash_incremental": _mh_inc_cand,
        "set_similarity": lambda: set_similarity_join(
            _entity_names_df(spark, base), "doc_id", "etext",
            t_num=3, t_den=5, return_candidates=True,
        ),
        "fuzzy_join": lambda: levenshtein_self_join(
            _fuzzy_names_df(spark, base), "doc_id", "name", d=2,
            max_segment_bucket=200, return_candidates=True,
        ),
        "set_similarity_incremental": lambda: set_similarity_join_incremental(
            _entity_names_df(spark, base).filter(F.col("doc_id") % 4 == 0),
            set_similarity_index(
                _entity_names_df(spark, base).filter(F.col("doc_id") % 4 != 0),
                "doc_id", "etext", t_num=3, t_den=5,
            ),
            "doc_id", "etext", t_num=3, t_den=5, return_candidates=True,
        ),
        "fuzzy_join_incremental": lambda: levenshtein_join_incremental(
            _fuzzy_names_df(spark, base).filter(F.col("doc_id") % 4 == 0),
            levenshtein_index(
                _fuzzy_names_df(spark, base).filter(F.col("doc_id") % 4 != 0),
                "doc_id", "name", d=2,
            ),
            "doc_id", "name", d=2, max_segment_bucket=200,
            return_candidates=True,
        ),
    }


def count_pairs(spark, base: str, only=None) -> dict[str, int]:
    out = {}
    for name, fn in pair_counters(spark, base).items():
        if only is not None and name not in only:
            continue
        out[name] = fn().count()
    return out


def time_ops(
    spark, base: str, extra_bits: int = 0, only: list[str] | None = None
) -> dict[str, float]:
    out = {}
    for name, fn in ops(spark, base, extra_bits).items():
        if only is not None and name not in only:
            continue
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


# Max allowed K×/1× wall-clock ratio at K=10 (≈2× the measured r2
# ratios, rounded up). A linear-work/shuffle-bounded plan stays well
# under these; a pair-space (quadratic) regression blows through them.
SCALE_BOUNDS: dict[str, float] = {
    "exact_dedup": 3.0,
    "minhash_lsh": 7.5,
    "minhash_incremental": 6.0,
    # measured swing 4.6-6.6 across rounds (bucket-cap pair work is
    # bursty at this corpus size); 9.0 still trips a 2^bits pair-space
    # regression, which shows ~25x+
    "embedding_near_dup_lsh": 9.0,
    "knn_join_blocked": 4.0,
    "tfidf": 5.5,
    "repeated_passages": 7.5,
    "kmv_distinct": 3.0,
    "global_shuffle_shards": 2.5,
    "pagerank": 3.0,
    "label_propagation": 2.5,
    "negative_ring_sample": 2.0,
    "bm25_topk": 2.5,
    "bigram_lm": 3.0,
    "triangle_counts": 3.0,
    "zorder_stats": 2.5,
    "set_similarity": 4.0,
    "sorted_neighborhood": 3.0,
    "heavy_hitters": 5.5,
    # sub-second base times: fixed job overhead inflates the ratio,
    # bounds sized to catch a plan regression, not scheduler noise
    "weighted_sample": 8.0,
    "phrase_search": 7.0,
    # sub-second op: the ratio is fixed-overhead/noise dominated
    # (measured ~1.05 at K=10); 5.0 still trips any real blowup
    "token_diversity": 5.0,
    "link_prediction": 4.0,
    "mad_outliers": 3.0,
    "fuzzy_join": 4.5,
    "fuzzy_join_incremental": 6.0,
    # round-4 measured at K=10: 1.3 / 2.69 / 0.99 / 2.91 — bounds ≈2×
    "set_similarity_incremental": 3.0,
    "salted_join_auto": 3.0,
    "leiden_distributed": 6.0,
    # round-6 linear ops (standalone calibration, not the bench
    # subset): one-scan batch ANN and the 2-shard sketch pipeline —
    # both scan-bound; bounds ~2× measured K=10 headroom
    "multi_query_topk": 4.0,
    "quantile_sketch": 4.0,
    # round-7 (standalone calibration, K=4 measured: wall 1.57,
    # semdedup pair_ratio exactly 4.0=K, wall 1.8 informational):
    # TextRank's bounded-community regime is linear — pagerank rounds
    # over group-local sentence graphs; ~3x measured headroom
    "textrank_summary": 4.5,
    # round-8 (standalone calibration, K=4 measured: 1.34 / 1.23 /
    # 0.97 — all fixed-overhead dominated): contamination and DSIR are
    # scan-bound map work + bucket/doc-width aggs; PQ's Lloyd update
    # shuffle is corpus-size independent by construction. Bounds ~3x
    # the expected K=10 linear wall; a corpus×benchmark or quadratic
    # regression shows 10x+
    "contamination": 4.0,
    "dsir_weights": 4.0,
    "pq_encode": 3.5,
    # round-8b (standalone calibration at K=4, see README): NB is
    # scan-bound map work + bucket-width count shuffles; the audio
    # match's exact-hash join pairs only identical quantized windows
    # (distinct clips don't collide), so both stay ~linear
    "nb_classify": 4.0,
    "audio_match": 4.0,
}

# Max allowed K×/1× CANDIDATE-pair-count ratio for the pair-space ops
# with counted-work probes (see pair_counters), expressed as a FACTOR
# OF K: a linear candidate stream grows ≈K (the probes run on the
# SALTED K× corpus, whose true pair structure is K× the base by
# construction), so bound = factor·K holds at any K while a quadratic
# regression (lost cap, degenerate bucketing, dropped length filter)
# shows ≈K·ratio more and trips immediately. Candidate counts are a
# pure function of the data — no ambient-noise margin needed; 2.5
# absorbs the K-dependent cross-copy residue and the incremental
# probes' fixed split overhead.
PAIR_BOUNDS_FACTOR: dict[str, float] = {
    "minhash_lsh": 2.5,
    "minhash_incremental": 2.5,
    "set_similarity": 2.5,
    "fuzzy_join": 2.5,
    "set_similarity_incremental": 2.5,
    "fuzzy_join_incremental": 2.5,
    # kmeans cluster-size skew (rotated-copy embeddings re-cluster
    # differently at K×) makes this probe burstier than the
    # salted-token bijection probes; 4.0·K still trips a lost
    # cluster-bound (all-pairs shows ≈ n/k·K ≈ 10K+ here)
    "semdedup_incremental": 4.0,
}
# K=10 calibration (round 5, 24-char fuzzy stems): minhash_lsh 8.85,
# minhash_incremental 8.10, set_similarity 10.02,
# set_similarity_incremental 9.98, fuzzy_join 10.00,
# fuzzy_join_incremental 10.00 — all ≈ K exactly, as the salted
# corpus guarantees; the factor-2.5 bound is pure regression headroom.


# The in-bench subset: the operators whose scaling is both most
# regression-prone (pair-space candidate generators, iterative graph
# rounds, index probes) and stable to measure at small K. Excluded:
# embedding_near_dup_lsh AND knn_join_blocked — at small K the
# rotated-copy corpus has genuinely denser bucket collisions (only K
# distinct rotations of each vector), so their K=4 ratios measure the
# data, not the plan (both stay in the standalone K=10 run, where the
# 2^ceil(log2 K) bucket growth restores constant occupancy); the
# remaining excluded ops are sub-second/noise-dominated and add more
# wall-clock than signal per round.
# wall asserts are enforced only when the box is this idle at block
# start; pair-count asserts are load-independent and always enforced
WALL_ASSERT_MAX_LOAD1 = 1.0


def load_sentinel() -> dict:
    """Self-diagnosing load snapshot for the bench/scale artifacts:
    1/5-min loadavg plus the count of currently RUNNING processes
    (state R in /proc — the concurrent-compute signal; sleeping
    daemons don't count). Two rounds in a row the driver's bench ran
    concurrently with other load and reported +20% while isolated
    reruns were flat; with the snapshot IN the artifact, a hot box is
    visible in the number itself instead of needing a forensic rerun.
    Lives here (not bench.py) so :func:`scale_block` can gate its
    wall asserts on it without a circular import."""
    try:
        l1, l5, _ = os.getloadavg()
    except OSError:  # pragma: no cover - /proc-less platform
        l1 = l5 = -1.0
    running = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    # field 3 (after the parenthesized comm) is state
                    if f.read().rsplit(")", 1)[1].split()[0] == "R":
                        running += 1
            except OSError:
                continue
    except OSError:  # pragma: no cover
        running = -1
    return {"load1": round(l1, 2), "load5": round(l5, 2), "procs_running": running}


BENCH_SUBSET = [
    "exact_dedup",
    "minhash_lsh",
    "minhash_incremental",
    "repeated_passages",
    "pagerank",
    "triangle_counts",
    "set_similarity",
    "fuzzy_join",
    "set_similarity_incremental",
    "fuzzy_join_incremental",
    "salted_join_auto",
    "leiden_distributed",
    "link_prediction",
]


def scale_block(
    spark,
    sf_dir: str,
    k: int = 10,
    do_assert: bool = False,
    only: list[str] | None = None,
) -> dict:
    """Run the 1×/K× ratio measurement on an existing session and
    return the result dict (the JSON payload ``main`` prints, and the
    ``scale_check`` block ``bench.py`` records in BENCH_DETAIL.json).
    With ``do_assert`` the dict includes per-operator bound
    ``violations`` (empty when clean). ``only`` restricts to a subset
    of operator names (bench uses ``BENCH_SUBSET`` to stay inside the
    per-round time envelope; the standalone CLI always runs
    everything).

    For the pair-space operators in :func:`pair_counters` the assert
    runs on ``pair_ratio`` — the K×/1× CANDIDATE-pair count, exactly
    reproducible at fixed data — against ``PAIR_BOUNDS``; their wall
    ratio is recorded but informational (wall on these ops swings with
    bursty bucket-cap work; round-4 verdict watch item). Everything
    else keeps the wall-clock bound in ``SCALE_BOUNDS`` — LOAD-GATED:
    enforced only when the sentinel taken here shows
    ``load1 < WALL_ASSERT_MAX_LOAD1`` (a busy box inflates wall
    ratios ~1.5× and produced round-9's false repeated_passages trip;
    pair-count bounds are load-independent and always enforced). The
    payload records the sentinel and whether wall bounds were
    enforced (``wall_asserts``)."""
    sentinel = load_sentinel()
    wall_enforced = 0 <= sentinel["load1"] < WALL_ASSERT_MAX_LOAD1
    out_dir = f"/tmp/spark_graft_scale_{k}x"
    build_scaled(spark, sf_dir, k, out_dir)
    extra_bits = max(0, (k - 1).bit_length())  # ceil(log2(k))
    base_t = time_ops(spark, sf_dir, only=only)
    big_t = time_ops(spark, out_dir, extra_bits, only=only)
    base_p = count_pairs(spark, sf_dir, only=only)
    big_p = count_pairs(spark, out_dir, only=only)
    ratio = {
        n: round(big_t[n] / base_t[n], 2) if base_t[n] > 0 else None
        for n in base_t
    }
    pair_ratio = {
        n: round(big_p[n] / base_p[n], 2) if base_p[n] > 0 else None
        for n in base_p
    }
    violations = {}
    if do_assert:
        for n, r in ratio.items():
            if n in pair_ratio:
                continue  # pair-counted op: wall is informational
            if not wall_enforced:
                continue  # hot box: wall ratios measure load, not plans
            if r is not None and n in SCALE_BOUNDS and r > SCALE_BOUNDS[n]:
                violations[n] = {"ratio": r, "bound": SCALE_BOUNDS[n]}
        for n, r in pair_ratio.items():
            if n not in PAIR_BOUNDS_FACTOR or r is None:
                continue
            bound = PAIR_BOUNDS_FACTOR[n] * k
            if r > bound:
                violations[n] = {"pair_ratio": r, "bound": bound}
    return {
        "k": k,
        "base_sec": base_t,
        "scaled_sec": big_t,
        "ratio": ratio,
        "base_pairs": base_p,
        "scaled_pairs": big_p,
        "pair_ratio": pair_ratio,
        "load": sentinel,
        "wall_asserts": "enforced" if wall_enforced else "skipped_load",
        **({"violations": violations} if do_assert else {}),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--assert"]
    do_assert = "--assert" in sys.argv[1:]
    k = int(args[0]) if args else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    result = scale_block(spark, sf_dir, k, do_assert)
    print(json.dumps(result))
    spark.stop()
    if do_assert and result.get("violations"):
        sys.exit(1)


if __name__ == "__main__":
    main()
