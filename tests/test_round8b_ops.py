"""Unit locks for the round-8 second-wave operators: hashed
Naive-Bayes classification (text/classify.py), CCNet perplexity
bucketing (text/lm.py ccnet_buckets), and the tokenizer-fertility
rollup (q240's composition). End-to-end value locks are the q238/q239/
q240 DuckDB oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _labeled(spark):
    # two clearly-separated classes: fruit vs metal vocabulary
    return spark.createDataFrame(
        [
            (1, "apple banana apple cherry", "fruit"),
            (2, "banana cherry banana apple", "fruit"),
            (3, "iron copper zinc iron", "metal"),
            (4, "copper zinc iron copper", "metal"),
        ],
        "doc_id long, text string, label string",
    )


def test_nb_classifier_separates_classes(spark):
    from graphragpart1datapipeline_spark.text.classify import (
        nb_classify,
        nb_train,
    )

    fitted = nb_train(_labeled(spark), buckets=64)
    test = spark.createDataFrame(
        [(10, "apple cherry banana"), (11, "zinc iron copper")],
        "doc_id long, text string",
    )
    preds = {
        r["doc_id"]: r["pred"]
        for r in nb_classify(test, fitted, buckets=64).collect()
    }
    assert preds == {10: "fruit", 11: "metal"}


def test_nb_score_is_exact_integer_arithmetic(spark):
    """iscore must equal iprior + tot*illw0 + Σ cnt·idelta recomputed
    by hand from the model tables — no hidden float accumulation."""
    from graphragpart1datapipeline_spark.text.classify import (
        nb_score,
        nb_train,
    )

    fitted = nb_train(_labeled(spark), buckets=64)
    model = {
        (r["label"], r["bucket"]): r["idelta"]
        for r in fitted["model"].collect()
    }
    classes = {
        r["label"]: (r["iprior"], r["illw0"])
        for r in fitted["classes"].collect()
    }
    test = spark.createDataFrame(
        [(10, "apple iron apple")], "doc_id long, text string"
    )
    from graphragpart1datapipeline_spark.text.dsir import (
        hashed_ngram_features,
    )

    feats = {
        r["bucket"]: r["cnt"]
        for r in hashed_ngram_features(test, buckets=64).collect()
    }
    tot = sum(feats.values())
    for r in nb_score(test, fitted, buckets=64).collect():
        iprior, illw0 = classes[r["label"]]
        expect = iprior + tot * illw0 + sum(
            cnt * model.get((r["label"], b), 0) for b, cnt in feats.items()
        )
        assert r["iscore"] == expect
        assert r["score"] == expect / 1_000_000.0


def test_nb_empty_doc_scores_prior_only(spark):
    from graphragpart1datapipeline_spark.text.classify import (
        nb_score,
        nb_train,
    )

    fitted = nb_train(_labeled(spark), buckets=64)
    empty = spark.createDataFrame([(9, "")], "doc_id long, text string")
    rows = nb_score(empty, fitted, buckets=64).collect()
    classes = {
        r["label"]: r["iprior"] for r in fitted["classes"].collect()
    }
    assert {r["label"]: r["iscore"] for r in rows} == classes


def test_nb_train_guards(spark):
    from graphragpart1datapipeline_spark.text.classify import nb_train

    with pytest.raises(ValueError, match="buckets"):
        nb_train(_labeled(spark), buckets=1)
    with pytest.raises(ValueError, match="empty training set"):
        nb_train(_labeled(spark).limit(0))


def test_ccnet_buckets_orders_and_labels(spark):
    """Model-likely text (frequent continuations of its contexts)
    lands in head; docs whose bigrams are RARE GIVEN a common context
    land below; short docs (< 2 tokens) always tail. NB: under a
    self-trained bigram MLE a doc of entirely UNIQUE bigrams scores
    p=1 per bigram (its contexts are seen once) — 'unlikely' means
    rare continuations of shared contexts, not rare words."""
    from graphragpart1datapipeline_spark.text.lm import ccnet_buckets

    rows = [(i, "the cat sat on the mat") for i in range(6)]
    # outliers: 'the' is a very common context, but 'the zig'/'the zag'
    # each occur once -> p(zig|the) is tiny
    rows += [(10, "the zig the zag"), (11, "the zog the zud")]
    rows += [(20, "single")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["bucket"]
        for r in ccnet_buckets(docs, sample_size=16).collect()
    }
    assert all(out[i] == "head" for i in range(6))
    assert out[20] == "tail"  # no bigrams -> no LM evidence
    assert out[10] == "tail" and out[11] == "tail"


def test_ccnet_buckets_guard_and_all_short(spark):
    from graphragpart1datapipeline_spark.text.lm import ccnet_buckets

    docs = spark.createDataFrame(
        [(1, "one"), (2, "two")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="sample_size"):
        ccnet_buckets(docs, sample_size=2)
    out = ccnet_buckets(docs, sample_size=8).collect()
    assert all(r["bucket"] == "tail" for r in out)  # no scored docs


def test_fertility_counts_match_bpe_apply(spark):
    """The q240 rollup arithmetic: symbols per word after 1 merge."""
    from graphragpart1datapipeline_spark.text import bpe_apply, bpe_train

    docs = spark.createDataFrame(
        [(1, "aa aa ab", "x"), (2, "ba", "y")],
        "doc_id long, text string, lang string",
    )
    merges = bpe_train(docs, num_merges=1)
    ap = bpe_apply(docs, merges)
    by_id = {r["doc_id"]: r["bpe_symbols"] for r in ap.collect()}
    # most frequent pair is 'a a' (freq 3: aa, aa, and inside ab? no —
    # pairs are within-word: 'a a' appears in aa (x2 words) = 2 + ab
    # has 'a b' = 1, ba has 'b a' = 1 → 'a a' wins (freq 2, tie-break
    # lexicographic beats 'a b'/'b a' at 1)
    assert by_id[1] == ["aa", "aa", "a", "b"]
    assert by_id[2] == ["b", "a"]


def test_nb_rowlocal_expr_matches_broadcast_scorer(spark):
    """The plan-literal row-local scorer and the broadcast-join scorer
    are the same integer arithmetic — identical (pred, score) on every
    doc, including the empty-text prior-only row."""
    from graphragpart1datapipeline_spark.text.classify import (
        nb_classify,
        nb_classify_expr,
        nb_train,
    )

    fitted = nb_train(_labeled(spark), buckets=64)
    test = spark.createDataFrame(
        [(10, "apple cherry banana"), (11, "zinc iron copper"),
         (12, "apple iron"), (13, ""), (14, None)],
        "doc_id long, text string",
    )
    a = {
        r["doc_id"]: (r["pred"], r["score"])
        for r in nb_classify(test, fitted, buckets=64).collect()
    }
    cls = nb_classify_expr(fitted, buckets=64)
    b = {
        r["doc_id"]: (r["pred"], r["score"])
        for r in test.select(
            "doc_id",
            cls.getField("pred").alias("pred"),
            cls.getField("score").alias("score"),
        ).collect()
    }
    assert a == b


def test_nb_rowlocal_literal_bound(spark):
    from graphragpart1datapipeline_spark.text.classify import (
        nb_classify_expr,
        nb_train,
    )

    fitted = nb_train(_labeled(spark), buckets=40000)
    with pytest.raises(ValueError, match="too large for a plan literal"):
        nb_classify_expr(fitted, buckets=40000)


def test_stream_quality_gate_batch_equivalence(spark, tmp_path):
    """The gate is row-local, so the streamed survivors must equal the
    batch filter exactly; an empty keep list raises."""
    from graphragpart1datapipeline_spark.text.classify import (
        nb_train,
        stream_quality_gate,
    )

    fitted = nb_train(_labeled(spark), buckets=64)
    docs = spark.createDataFrame(
        [(10, "apple cherry banana"), (11, "zinc iron copper"),
         (12, "banana banana"), (13, "iron zinc")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="keep must be non-empty"):
        stream_quality_gate(docs, fitted, [])
    batch = stream_quality_gate(docs, fitted, ["fruit"], buckets=64)
    batch_rows = sorted(
        (r["doc_id"], r["pred"]) for r in batch.collect()
    )
    assert [d for d, _ in batch_rows] == [10, 12]
    src = str(tmp_path / "q_gate_src")
    docs.write.parquet(src)
    sdf = spark.readStream.schema(docs.schema).parquet(src)
    gated = stream_quality_gate(sdf, fitted, ["fruit"], buckets=64)
    q = (
        gated.writeStream.format("memory")
        .queryName("r8b_quality_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["pred"])
        for r in spark.sql("select * from r8b_quality_sink").collect()
    )
    assert got == batch_rows


# ---------------------------------------------------------------------------
# Audio offset-histogram matching (multimodal/audio.py)
# ---------------------------------------------------------------------------


def test_audio_near_dup_through_decode_seam(spark):
    """Full composition through the Arrow decode seam: a time-shifted
    copy of a clip (same payload, decoder drops leading frames) must
    match its original at ONE dominant offset; unrelated clips must
    not match. The stub raises without a decoder."""
    from graphragpart1datapipeline_spark.multimodal.audio import (
        audio_near_dup_pairs,
        decode_audio_frames,
        fake_decode_frames,
    )

    assets = spark.createDataFrame(
        [
            ("clip_a", "audio", bytearray(b"payload-one")),
            ("clip_b", "audio", bytearray(b"payload-two")),
            # same recording, started 2 frames later
            ("clip_a_shift", "audio", bytearray(b"payload-one\x00shift2")),
        ],
        "asset_id string, kind string, payload binary",
    )

    def decoder(raw: bytes) -> list[list[float]]:
        if raw.endswith(b"\x00shift2"):
            return fake_decode_frames(raw[: -len(b"\x00shift2")])[2:]
        return fake_decode_frames(raw)

    pairs = audio_near_dup_pairs(
        assets, decoder=decoder, min_matches=5
    ).collect()
    assert len(pairs) == 1
    (p,) = pairs
    assert {p["a"], p["b"]} == {"clip_a", "clip_a_shift"}
    assert abs(p["offset"]) == 2
    # 14 frames in the copy -> 12 shared 3-frame windows
    assert p["n_matches"] == 12
    with pytest.raises(NotImplementedError, match="no audio codec"):
        decode_audio_frames(assets)


def test_audio_match_common_hash_suppression(spark):
    """A fingerprint present in more than max_df clips (silence) is
    dropped before the join — clips sharing ONLY silence never pair."""
    from graphragpart1datapipeline_spark.multimodal.audio import (
        audio_match_pairs,
        frame_shingle_fingerprints,
    )

    silence = [[0.0, 0.0]] * 6
    clips = spark.createDataFrame(
        [(f"s{i}", silence) for i in range(5)],
        "asset_id string, frames array<array<double>>",
    )
    fps = frame_shingle_fingerprints(clips, shingle=3)
    # every clip carries the identical all-zero windows; with max_df=4
    # (< 5 clips) they are suppressed -> no pairs at all
    assert audio_match_pairs(fps, min_matches=1, max_df=4).count() == 0
    # raising max_df past the clip count lets them match again
    assert audio_match_pairs(fps, min_matches=1, max_df=10).count() > 0


def test_audio_fingerprint_guards_and_short_clips(spark):
    from graphragpart1datapipeline_spark.multimodal.audio import (
        audio_match_pairs,
        frame_shingle_fingerprints,
    )

    clips = spark.createDataFrame(
        [("short", [[1.0], [2.0]])],
        "asset_id string, frames array<array<double>>",
    )
    # fewer frames than the shingle -> no fingerprint rows
    assert frame_shingle_fingerprints(clips, shingle=3).count() == 0
    with pytest.raises(ValueError, match="shingle"):
        frame_shingle_fingerprints(clips, shingle=0)
    with pytest.raises(ValueError, match="quant"):
        frame_shingle_fingerprints(clips, quant=0.0)
    with pytest.raises(ValueError, match="min_matches"):
        audio_match_pairs(
            frame_shingle_fingerprints(clips), min_matches=0
        )


# ---------------------------------------------------------------------------
# Persisted NB index verbs (build / upsert / delete)
# ---------------------------------------------------------------------------


def test_nb_index_upsert_equals_retrain(spark, tmp_path):
    from graphragpart1datapipeline_spark.text.classify import (
        nb_build_index,
        nb_index_upsert,
        nb_model,
        nb_train,
    )

    lab = _labeled(spark)
    path = str(tmp_path / "nbidx")
    nb_build_index(lab.filter(F.col("doc_id") <= 2), path, buckets=64)
    nb_index_upsert(path, lab.filter(F.col("doc_id") > 2))
    got = nb_model(spark, path)
    want = nb_train(lab, buckets=64)
    for key in ("model", "classes"):
        assert sorted(map(tuple, got[key].collect())) == sorted(
            map(tuple, want[key].collect())
        )


def test_nb_index_delete_equals_retrain_without(spark, tmp_path):
    from graphragpart1datapipeline_spark.text.classify import (
        nb_build_index,
        nb_index_delete,
        nb_model,
        nb_train,
    )

    lab = _labeled(spark)
    path = str(tmp_path / "nbdel")
    nb_build_index(lab, path, buckets=64)
    nb_index_delete(path, lab.filter(F.col("doc_id") == 2))
    got = nb_model(spark, path)
    want = nb_train(lab.filter(F.col("doc_id") != 2), buckets=64)
    for key in ("model", "classes"):
        assert sorted(map(tuple, got[key].collect())) == sorted(
            map(tuple, want[key].collect())
        )


def test_nb_index_delete_removes_emptied_class(spark, tmp_path):
    """Deleting every doc of a class must remove the class entirely
    (a zero-doc prior is ln(0)) — the model genuinely unlearns."""
    from graphragpart1datapipeline_spark.text.classify import (
        nb_build_index,
        nb_index_delete,
        nb_model,
    )

    lab = _labeled(spark)
    path = str(tmp_path / "nbcls")
    nb_build_index(lab, path, buckets=64)
    nb_index_delete(path, lab.filter(F.col("label") == "metal"))
    got = nb_model(spark, path)
    assert [r["label"] for r in got["classes"].collect()] == ["fruit"]
    assert got["model"].filter(F.col("label") == "metal").count() == 0


def test_nb_index_gates(spark, tmp_path):
    from graphragpart1datapipeline_spark.text.classify import (
        nb_build_index,
        nb_index_delete,
        nb_index_upsert,
        nb_params,
    )

    lab = _labeled(spark)
    path = str(tmp_path / "nbgate")
    nb_build_index(lab, path, buckets=64)
    # re-ingesting a registered id -> loud collision
    with pytest.raises(ValueError, match="re-ingests registered"):
        nb_index_upsert(path, lab.filter(F.col("doc_id") == 1))
    # params mismatch -> loud
    fresh = spark.createDataFrame(
        [(99, "new doc", "fruit")], "doc_id long, text string, label string"
    )
    with pytest.raises(ValueError, match="do not match the index"):
        nb_index_upsert(path, fresh, buckets=128)
    # deleting an unregistered id -> loud
    with pytest.raises(ValueError, match="not registered"):
        nb_index_delete(path, fresh)
    # deleting everything -> refuses
    with pytest.raises(ValueError, match="empty the index"):
        nb_index_delete(path, lab)
    # not an index -> friendly
    with pytest.raises(FileNotFoundError, match="nb_build_index"):
        nb_params(spark, str(tmp_path / "nowhere"))


def test_nb_index_delete_label_mismatch_and_dup_gates(spark, tmp_path):
    """The delete gate checks the REGISTERED (id, label) pair — a
    caller-supplied wrong label must raise, never decrement the wrong
    class; duplicate ids in either verb's batch raise too."""
    from graphragpart1datapipeline_spark.text.classify import (
        nb_build_index,
        nb_index_delete,
        nb_index_upsert,
    )

    lab = _labeled(spark)
    path = str(tmp_path / "nbmis")
    nb_build_index(lab, path, buckets=64)
    wrong = spark.createDataFrame(
        [(1, "apple banana apple cherry", "metal")],  # registered fruit
        "doc_id long, text string, label string",
    )
    with pytest.raises(ValueError, match="not registered with that label"):
        nb_index_delete(path, wrong)
    dup = spark.createDataFrame(
        [(50, "a b", "fruit"), (50, "a b", "fruit")],
        "doc_id long, text string, label string",
    )
    with pytest.raises(ValueError, match="duplicate ids"):
        nb_index_upsert(path, dup)
    dup_del = spark.createDataFrame(
        [(1, "apple banana apple cherry", "fruit")] * 2,
        "doc_id long, text string, label string",
    )
    with pytest.raises(ValueError, match="duplicate ids"):
        nb_index_delete(path, dup_del)


def test_pretrain_pipeline_with_classifier_gate(spark):
    from graphragpart1datapipeline_spark.plans.pretrain_demo import (
        build_pretrain_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    out = build_pretrain_pipeline(
        sf, classifier_keep=["en", "de", "es", "fr", "zh"]
    ).run(spark)
    # keep-everything gate: schema unchanged, subset of the heuristic
    # gate's survivors, and the funnel still completes
    assert out["classifier_gated"].columns == out["quality_gated"].columns
    n_gate = out["classifier_gated"].count()
    assert 0 < n_gate <= out["quality_gated"].count()
    assert out["packed"].count() > 0
    # a restrictive keep list shrinks the gate output
    small = build_pretrain_pipeline(sf, classifier_keep=["en"]).run(spark)
    assert 0 < small["classifier_gated"].count() < n_gate
    # default build is unchanged: no classifier stage registered
    assert "classifier_gated" not in build_pretrain_pipeline(sf).run(spark)


# ---------------------------------------------------------------------------
# k-truss (graph/truss.py)
# ---------------------------------------------------------------------------


def test_ktruss_peels_to_known_core(spark):
    """K4 plus a pendant triangle: the 4-truss is exactly the K4 (every
    K4 edge has 2 common neighbors; the pendant triangle's edges have
    only 1 and peel — which then cannot resurrect anything)."""
    from graphragpart1datapipeline_spark.graph.truss import (
        edge_support,
        ktruss,
    )

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(4, 5), (4, 6), (5, 6)]
    edges = spark.createDataFrame(k4 + pendant, "src long, dst long")
    supp = {
        (r["a"], r["b"]): r["support"]
        for r in edge_support(edges, "src", "dst").collect()
    }
    assert supp[(1, 2)] == 2 and supp[(5, 6)] == 1
    out = ktruss(edges, k=4)  # fixpoint mode
    assert sorted((r["a"], r["b"]) for r in out.collect()) == sorted(k4)
    assert all(r["support"] == 2 for r in out.collect())
    # k=3 keeps everything (every edge is in >= 1 triangle)
    assert ktruss(edges, k=3).count() == 9
    # k high enough empties the graph
    assert ktruss(edges, k=5).count() == 0


def test_ktruss_fixed_rounds_superset_and_guards(spark):
    """A triangle chain where peeling cascades: fixed rounds give a
    superset of the fixpoint, converging as rounds grow."""
    from graphragpart1datapipeline_spark.graph.truss import ktruss

    # two triangles sharing edge (2,3); K4 on {5,6,7,8} attached via
    # triangle (3,5,6)? keep it simple: triangle chain
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)],
        "src long, dst long",
    )
    r1 = ktruss(edges, k=4, rounds=1).count()
    fix = ktruss(edges, k=4).count()
    assert r1 >= fix
    with pytest.raises(ValueError, match="k must be >= 3"):
        ktruss(edges, k=2)
    with pytest.raises(ValueError, match="rounds"):
        ktruss(edges, k=4, rounds=0)


# ---------------------------------------------------------------------------
# Retrieval metrics (vector/metrics.py)
# ---------------------------------------------------------------------------


def test_retrieval_metrics_hand_computed(spark):
    import math

    from graphragpart1datapipeline_spark.vector.metrics import (
        mean_retrieval_metrics,
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        # qA: perfect ordering of its two relevant docs
        [("qA", 10, 1), ("qA", 11, 2), ("qA", 12, 3),
         # qB: first relevant at rank 2
         ("qB", 20, 1), ("qB", 21, 2), ("qB", 22, 3),
         # qC: nothing relevant retrieved (and none exists)
         ("qC", 30, 1)],
        "query_id string, vec_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [("qA", 10, 2), ("qA", 11, 1), ("qB", 21, 1), ("qB", 99, 2)],
        "query_id string, vec_id long, rel long",
    )
    out = {
        r["query_id"]: r
        for r in retrieval_metrics(run, qrels, k=3).collect()
    }
    w = lambda r: math.floor(1_000_000 / math.log2(r + 1) + 0.5)
    # qA: rr = 1e6; dcg = 3*w1 + 1*w2; ideal ordering identical
    assert out["qA"]["rr"] == 1_000_000
    assert out["qA"]["dcg_s"] == 3 * w(1) + 1 * w(2)
    assert out["qA"]["idcg_s"] == out["qA"]["dcg_s"]
    assert out["qA"]["ndcg"] == 1.0
    # qB: rr = round(1e6/2); dcg = 1*w2; ideal = 3*w1 + 1*w2 (doc 99
    # counts in the ideal even though the run missed it)
    assert out["qB"]["rr"] == 500_000
    assert out["qB"]["dcg_s"] == 1 * w(2)
    assert out["qB"]["idcg_s"] == 3 * w(1) + 1 * w(2)
    assert out["qB"]["ndcg"] == w(2) / (3 * w(1) + 1 * w(2))
    # qC: all zeros, ndcg defined as 0.0
    assert (out["qC"]["rr"], out["qC"]["dcg_s"], out["qC"]["ndcg"]) == (
        0, 0, 0.0,
    )
    roll = mean_retrieval_metrics(retrieval_metrics(run, qrels, k=3)).collect()[0]
    assert roll["n_queries"] == 3
    assert abs(roll["mrr"] - (1.0 + 0.5 + 0.0) / 3) < 1e-9


def test_retrieval_metrics_guards(spark):
    from graphragpart1datapipeline_spark.vector.metrics import (
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        [("q", 1, 1)], "query_id string, vec_id long, rank long"
    )
    big = spark.createDataFrame(
        [("q", 1, 40)], "query_id string, vec_id long, rel long"
    )
    with pytest.raises(Exception, match="rel exceeds 30"):
        retrieval_metrics(run, big, k=3).collect()
    with pytest.raises(ValueError, match="k must be >= 1"):
        retrieval_metrics(run, big, k=0)
    # 0-based ranks must raise, never silently wrap the log2 discount
    zero_based = spark.createDataFrame(
        [("q", 1, 0)], "query_id string, vec_id long, rank long"
    )
    ok = spark.createDataFrame(
        [("q", 1, 1)], "query_id string, vec_id long, rel long"
    )
    with pytest.raises(Exception, match="1-based"):
        retrieval_metrics(zero_based, ok, k=3).collect()


def test_retrieval_metrics_failed_queries_score_zero(spark):
    """TREC convention: a query that retrieved nothing (or nothing
    within k) still gets a row with rr=0/ndcg=0 — the rollup must
    never be inflated by dropping exactly the failures."""
    from graphragpart1datapipeline_spark.vector.metrics import (
        mean_retrieval_metrics,
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        # qGood: hit at rank 1; qLate: only result is beyond k
        [("qGood", 1, 1), ("qLate", 2, 7)],
        "query_id string, vec_id long, rank long",
    )
    qrels = spark.createDataFrame(
        # qNone appears only in qrels (run returned zero rows)
        [("qGood", 1, 1), ("qLate", 2, 1), ("qNone", 3, 2)],
        "query_id string, vec_id long, rel long",
    )
    out = {
        r["query_id"]: (r["rr"], r["ndcg"])
        for r in retrieval_metrics(run, qrels, k=3).collect()
    }
    assert set(out) == {"qGood", "qLate", "qNone"}
    assert out["qGood"][0] == 1_000_000 and out["qGood"][1] == 1.0
    assert out["qLate"] == (0, 0.0)
    assert out["qNone"] == (0, 0.0)
    roll = mean_retrieval_metrics(
        retrieval_metrics(run, qrels, k=3)
    ).collect()[0]
    assert roll["n_queries"] == 3
    assert abs(roll["mrr"] - 1.0 / 3) < 1e-9
