"""Round-8 operator units: contamination detection, PII audit,
product quantization (train/encode/ADC), DSIR selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f g h"),          # fully inside the benchmark
            (2, "a b c d e zz yy xx ww vv"),  # partially contaminated
            (3, "p q r s t u v w"),           # clean
            (4, "tiny doc"),                  # shorter than the window
        ],
        "doc_id long, text string",
    )


def test_contamination_report_fractions(spark):
    from graphragpart1datapipeline_spark.text.contamination import (
        contamination_report,
        ngram_hash_set,
    )

    docs = _docs(spark)
    bench = spark.createDataFrame(
        [("a b c d e f g h i j",)], "text string"
    )
    rep = {
        r["doc_id"]: r
        for r in contamination_report(
            docs, ngram_hash_set(bench, n=5), n=5, threshold=0.5
        ).collect()
    }
    # doc 1: all 4 of its 5-grams inside the benchmark text
    assert rep[1]["total_ngrams"] == 4
    assert rep[1]["hit_ngrams"] == 4
    assert rep[1]["overlap_frac"] == 1.0 and rep[1]["contaminated"]
    # doc 2: only "a b c d e" hits (1 of 6)
    assert rep[2]["total_ngrams"] == 6 and rep[2]["hit_ngrams"] == 1
    assert not rep[2]["contaminated"]
    # doc 3: clean
    assert rep[3]["hit_ngrams"] == 0 and not rep[3]["contaminated"]
    # doc 4: shorter than the window — undetectable, 0.0 not NULL
    assert rep[4]["total_ngrams"] == 0
    assert rep[4]["overlap_frac"] == 0.0 and not rep[4]["contaminated"]


def test_decontaminate_by_fraction_drops_only_flagged(spark):
    from graphragpart1datapipeline_spark.text.contamination import (
        decontaminate_by_fraction,
        ngram_hash_set,
    )

    docs = _docs(spark)
    bench = spark.createDataFrame(
        [("a b c d e f g h i j",)], "text string"
    )
    kept = decontaminate_by_fraction(
        docs, ngram_hash_set(bench, n=5), n=5, threshold=0.5
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4]
    # original columns pass through untouched
    assert kept.columns == docs.columns


def test_contamination_threshold_guard(spark):
    from graphragpart1datapipeline_spark.text.contamination import (
        contamination_report,
        ngram_hash_set,
    )

    docs = _docs(spark)
    b = ngram_hash_set(docs.select("text"), n=5)
    with pytest.raises(ValueError, match="threshold"):
        contamination_report(docs, b, threshold=0.0)


# ---------------------------------------------------------------------------
# PII audit
# ---------------------------------------------------------------------------


def test_pii_counts_kinds_and_groups(spark):
    from graphragpart1datapipeline_spark.text import pii_counts

    df = spark.createDataFrame(
        [
            ("s1", "mail a@b.com and c@d.org plus https://x.io/z"),
            ("s1", "clean text"),
            ("s2", "call +1 555 010 1234 now"),
        ],
        "source string, text string",
    )
    flat = {r["kind"]: r for r in pii_counts(df, "text").collect()}
    assert flat["EMAIL"]["matches"] == 2
    assert flat["EMAIL"]["docs_with_match"] == 1
    assert flat["URL"]["matches"] == 1
    assert flat["PHONE"]["matches"] == 1
    grouped = {
        (r["source"], r["kind"]): r["matches"]
        for r in pii_counts(df, "text", group_col="source").collect()
    }
    assert grouped[("s1", "EMAIL")] == 2
    assert grouped[("s2", "EMAIL")] == 0
    assert grouped[("s2", "PHONE")] == 1


def test_pii_counts_consistent_with_redaction(spark):
    from graphragpart1datapipeline_spark.text import pii_counts, pii_redact

    df = spark.createDataFrame(
        [("x@y.com and http://a.b c",), ("none",)], "text string"
    )
    total = sum(
        r["matches"] for r in pii_counts(df, "text").collect()
    )
    changed = df.select(
        (pii_redact("text") != F.col("text")).cast("int").alias("c")
    ).agg(F.sum("c")).collect()[0][0]
    assert total >= changed  # every redacted doc had >= 1 counted match


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def _emb(spark):
    # two well-separated groups per subspace so argmin is unambiguous
    rows = [
        (1, [1.0, 0.0, 10.0, 0.0]),
        (2, [1.1, 0.0, 10.1, 0.0]),
        (3, [0.0, 1.0, 0.0, 10.0]),
        (4, [0.0, 1.1, 0.0, 10.1]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_train_codebook_shape_and_encode(spark):
    from graphragpart1datapipeline_spark.vector.pq import (
        pq_encode,
        pq_train,
    )

    emb = _emb(spark)
    book = pq_train(emb, m=2, ksub=2, iters=2, seed=42)
    rows = book.collect()
    assert len(rows) == 4  # m * ksub
    assert {r["sub"] for r in rows} == {0, 1}
    assert all(len(r["centroid"]) == 2 for r in rows)
    codes = pq_encode(emb, book)
    got = {(r["vec_id"], r["sub"]): r["code"] for r in codes.collect()}
    assert len(got) == 8  # m rows per vector
    # rows 1,2 quantize together and apart from 3,4 in BOTH subspaces
    for s in (0, 1):
        assert got[(1, s)] == got[(2, s)]
        assert got[(3, s)] == got[(4, s)]
        assert got[(1, s)] != got[(3, s)]


def test_pq_adc_ranks_near_neighbors_first(spark):
    from graphragpart1datapipeline_spark.vector.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = _emb(spark)
    book = pq_train(emb, m=2, ksub=2, iters=2, seed=42)
    codes = pq_encode(emb, book)
    top = pq_adc_topk(codes, book, [1.0, 0.0, 10.0, 0.0], k=4).collect()
    # the query IS group {1,2}: both rank before {3,4}; ties by id
    assert [r["vec_id"] for r in top[:2]] == [1, 2]
    assert {r["vec_id"] for r in top[2:]} == {3, 4}
    assert top[0]["adist"] == top[1]["adist"]  # same code tuple


def test_pq_adc_composes_with_cluster_prefilter(spark):
    """IVF-PQ serving shape: pre-filter the codes to a candidate id
    set (the coarse probe's output) — ADC then scores only those."""
    from graphragpart1datapipeline_spark.vector.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = _emb(spark)
    book = pq_train(emb, m=2, ksub=2, iters=2, seed=42)
    codes = pq_encode(emb, book).filter(F.col("vec_id").isin([3, 4]))
    top = pq_adc_topk(codes, book, [1.0, 0.0, 10.0, 0.0], k=4).collect()
    assert sorted(r["vec_id"] for r in top) == [3, 4]


def test_pq_guards(spark):
    from graphragpart1datapipeline_spark.vector.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = _emb(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=3)
    with pytest.raises(ValueError, match="m >= 1"):
        pq_train(emb, m=0)
    book = pq_train(emb, m=2, ksub=2, iters=1)
    with pytest.raises(ValueError, match="query dim"):
        pq_adc_topk(pq_encode(emb, book), book, [1.0, 0.0], k=2)
    bad_dim = spark.createDataFrame(
        [(9, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="does not match codebook"):
        pq_encode(bad_dim, book)


def test_pq_empty_cluster_keeps_previous_centroid(spark):
    from graphragpart1datapipeline_spark.vector.pq import pq_train

    # 2 identical vectors, ksub=2: after iteration 1 every row assigns
    # to one centroid; the emptied one must keep its init value, not
    # vanish or go NaN
    emb = spark.createDataFrame(
        [(1, [5.0, 5.0]), (2, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    book = pq_train(emb, m=1, ksub=2, iters=2, seed=42)
    rows = book.collect()
    assert len(rows) == 2
    assert all(
        all(x == x for x in r["centroid"]) for r in rows  # no NaN
    )


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_dsir_weights_prefer_target_like_docs(spark):
    from graphragpart1datapipeline_spark.text.dsir import dsir_weights

    raw = spark.createDataFrame(
        [
            (1, "science physics theorem proof"),
            (2, "science theorem lemma"),
            (3, "buy cheap pills now click"),
            (4, "click buy now"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [("science physics theorem proof lemma",)], "text string"
    )
    w = {r["doc_id"]: r["weight"] for r in dsir_weights(raw, target).collect()}
    assert len(w) == 4
    assert min(w[1], w[2]) > max(w[3], w[4])


def test_dsir_select_top_cut_deterministic(spark):
    from graphragpart1datapipeline_spark.text.dsir import dsir_select

    raw = spark.createDataFrame(
        [
            (1, "science physics theorem proof"),
            (2, "science theorem lemma"),
            (3, "buy cheap pills now click"),
            (4, "click buy now"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [("science physics theorem proof lemma",)], "text string"
    )
    sel = dsir_select(raw, target, frac=0.5)
    assert sorted(r["doc_id"] for r in sel.collect()) == [1, 2]
    assert set(sel.columns) == {"doc_id", "text", "weight"}
    with pytest.raises(ValueError, match="frac"):
        dsir_select(raw, target, frac=0.0)


def test_hashed_ngram_features_counts(spark):
    from graphragpart1datapipeline_spark.text.dsir import (
        hashed_ngram_features,
    )

    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    # grams: a, b, a (unigrams) + "a b", "b a" (bigrams) = 5 total
    total = (
        hashed_ngram_features(df, buckets=1 << 20)
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert total == 5
    with pytest.raises(ValueError, match="buckets"):
        hashed_ngram_features(df, buckets=1)


def test_ivfpq_topk_two_stage(spark):
    from graphragpart1datapipeline_spark.vector.pq import (
        ivfpq_topk,
        pq_encode,
        pq_train,
    )
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_assignments,
    )

    emb = _emb(spark)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 10.0, 0.0]), (1, [0.0, 1.0, 0.0, 10.0])],
        "cid long, embedding array<double>",
    )
    assign = ivf_assignments(
        emb, cents, "embedding", "vec_id", "embedding", "cid"
    )
    book = pq_train(emb, m=2, ksub=2, iters=2, seed=42)
    codes = pq_encode(emb, book)
    out = ivfpq_topk(
        emb, codes, book, cents, assign, [1.0, 0.0, 10.0, 0.0],
        k=2, shortlist=2, nprobe=1,
    ).collect()
    # nprobe=1 confines serving to cluster 0 = rows {1, 2}; the exact
    # rerank puts the identical vector first
    assert [r["vec_id"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"]
    # nprobe=2 opens the whole corpus
    full = ivfpq_topk(
        emb, codes, book, cents, assign, [1.0, 0.0, 10.0, 0.0],
        k=4, shortlist=4, nprobe=2,
    ).collect()
    assert sorted(r["vec_id"] for r in full) == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="shortlist >= k"):
        ivfpq_topk(
            emb, codes, book, cents, assign,
            [1.0, 0.0, 10.0, 0.0], k=5, shortlist=2,
        )


def test_stream_decontaminate_gate_batch_equivalence(spark, tmp_path):
    """The gate is row-local, so applying it to a batch frame and to
    the same rows streamed must produce identical survivors — and the
    bloom can only OVER-count hits vs the exact report (no false
    negatives)."""
    import os

    from graphragpart1datapipeline_spark.text.contamination import (
        contamination_bloom,
        contamination_report,
        contamination_stats_cols,
        ngram_hash_set,
        stream_decontaminate,
    )

    docs = _docs(spark)
    bench = spark.createDataFrame(
        [("a b c d e f g h i j",)], "text string"
    )
    bench_set = ngram_hash_set(bench, n=5)
    dense = contamination_bloom(bench_set, num_bits=1 << 12)

    # batch application of the same row-local columns
    total, hits, frac = contamination_stats_cols(
        "text", dense, num_bits=1 << 12, n=5
    )
    batch = docs.withColumn("overlap_frac", frac).filter(
        F.col("overlap_frac") < 0.5
    )
    batch_ids = sorted(r["doc_id"] for r in batch.collect())

    # the true stream
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    sdf = spark.readStream.schema(docs.schema).parquet(src)
    gated = stream_decontaminate(
        sdf, dense, n=5, threshold=0.5, num_bits=1 << 12
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("r8_decon_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_ids = sorted(
        r["doc_id"] for r in spark.table("r8_decon_sink").collect()
    )
    assert stream_ids == batch_ids
    # conservative: bloom hit count >= exact hit count per doc
    exact = {
        r["doc_id"]: r["hit_ngrams"]
        for r in contamination_report(
            docs, bench_set, n=5, threshold=0.5
        ).collect()
    }
    bloomed = {
        r["doc_id"]: r["hit_ngrams"]
        for r in docs.select("doc_id", hits.alias("hit_ngrams")).collect()
    }
    assert all(bloomed[d] >= exact[d] for d in exact)
    with pytest.raises(ValueError, match="threshold"):
        stream_decontaminate(sdf, dense, threshold=1.5)


def test_pretrain_pipeline_with_dsir_stage(spark):
    import math

    from graphragpart1datapipeline_spark.plans.pretrain_demo import (
        build_pretrain_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    out = build_pretrain_pipeline(sf, dsir_frac=0.6).run(spark)
    n_clean = out["decontaminated"].count()
    n_dsir = out["dsir_selected"].count()
    assert n_dsir == math.ceil(n_clean * 0.6)
    # selection is a subset of the decontaminated set, schema unchanged
    assert out["dsir_selected"].columns == out["decontaminated"].columns
    extra = out["dsir_selected"].join(
        out["decontaminated"].select("doc_id"), "doc_id", "left_anti"
    )
    assert extra.count() == 0
    # the rest of the funnel still runs off the reduced corpus
    assert out["rebalanced"].count() <= n_dsir
    assert out["packed"].count() > 0
    # default build is unchanged: no dsir stage registered
    assert "dsir_selected" not in build_pretrain_pipeline(sf).run(spark)


def test_pq_index_upsert_equals_rebuild(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.pq import (
        pq_build_index,
        pq_codebook,
        pq_encode,
        pq_query,
        pq_train,
        pq_upsert,
    )

    emb = _emb(spark)
    day0 = emb.filter(F.col("vec_id") <= 2)
    inc = emb.filter(F.col("vec_id") > 2)
    book = pq_train(day0, m=2, ksub=2, iters=2, seed=42)
    path = str(tmp_path / "pqidx")
    pq_build_index(day0, book, path)
    pq_upsert(path, inc)
    # upsert == rebuild-encode under the frozen codebook
    rebuilt = sorted(
        map(tuple, pq_encode(emb, book).collect())
    )
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == rebuilt
    # serving reads only persisted tables
    top = pq_query(spark, path, [1.0, 0.0, 10.0, 0.0], k=4).collect()
    assert len(top) == 4
    # the codebook is self-describing
    assert pq_codebook(spark, path).count() == 4
    # id collision refuses loudly
    import pytest as _pt

    with _pt.raises(ValueError, match="re-ingests ids"):
        pq_upsert(path, day0)


def test_pq_delete_swap_safe(spark, tmp_path):
    import os

    from graphragpart1datapipeline_spark.vector.pq import (
        pq_build_index,
        pq_delete,
        pq_train,
    )

    emb = _emb(spark)
    book = pq_train(emb, m=2, ksub=2, iters=1, seed=42)
    path = str(tmp_path / "pqdel")
    pq_build_index(emb, book, path)
    out = pq_delete(path, spark.createDataFrame([(1,)], "vec_id long"))
    assert sorted(set(r["vec_id"] for r in out.collect())) == [2, 3, 4]
    assert not os.path.exists(path + "__tmp")
    assert not os.path.exists(path + "__old")
    # refuses to empty
    everyone = spark.createDataFrame([(2,), (3,), (4,)], "vec_id long")
    with pytest.raises(ValueError, match="empty the index"):
        pq_delete(path, everyone)
    assert spark.read.parquet(path).select("vec_id").distinct().count() == 3
    # crashed-swap leftover refuses loudly
    os.makedirs(path + "__old")
    with pytest.raises(FileExistsError, match="crashed"):
        pq_delete(path, spark.createDataFrame([(2,)], "vec_id long"))


def test_pq_codebook_missing_is_friendly(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.pq import pq_codebook

    with pytest.raises(FileNotFoundError, match="no codebook table"):
        pq_codebook(spark, str(tmp_path / "nowhere"))


def test_ivfpq_residual_beats_or_ties_plain_pq_shape(spark):
    """Residual codes reconstruct cluster-relative offsets; on the
    well-separated toy corpus the residual ADC must rank the query's
    own cluster first, and the per-cluster tables must confine
    nprobe=1 serving to that cluster."""
    from graphragpart1datapipeline_spark.vector.pq import (
        ivfpq_residual_topk,
        pq_encode,
        pq_residuals,
        pq_train,
    )
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_assignments,
    )

    emb = _emb(spark)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 10.0, 0.0]), (1, [0.0, 1.0, 0.0, 10.0])],
        "cid long, embedding array<double>",
    )
    assign = ivf_assignments(
        emb, cents, "embedding", "vec_id", "embedding", "cid"
    )
    res = pq_residuals(emb, cents, assign)
    got = {r["vec_id"]: r for r in res.collect()}
    # exact elementwise subtraction
    assert got[1]["residual"] == [0.0, 0.0, 0.0, 0.0]
    assert got[3]["residual"] == [0.0, 0.0, 0.0, 0.0]
    book = pq_train(
        res, m=2, ksub=2, vec_col="residual", iters=2, seed=42
    )
    codes = pq_encode(res, book, vec_col="residual")
    one = ivfpq_residual_topk(
        codes, assign, book, cents, [1.0, 0.0, 10.0, 0.0],
        k=4, nprobe=1,
    ).collect()
    assert sorted(r["vec_id"] for r in one) == [1, 2]  # own cluster only
    both = ivfpq_residual_topk(
        codes, assign, book, cents, [1.0, 0.0, 10.0, 0.0],
        k=4, nprobe=2,
    ).collect()
    assert [r["vec_id"] for r in both[:1]] == [1]  # exact self first
    assert sorted(r["vec_id"] for r in both) == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="query dim"):
        ivfpq_residual_topk(codes, assign, book, cents, [1.0], k=1)


def test_image_near_dup_pairs_through_decode_seam(spark):
    """The full multimodal composition: payload bytes -> grid (decode
    seam, deterministic stand-in) -> dHash -> banded hamming join.
    Identical payloads collide at hamming 0; a one-cell nudge stays
    within the verify bound; unrelated images never pair."""
    from graphragpart1datapipeline_spark.multimodal.assets import (
        dhash_expr,
        image_near_dup_pairs,
    )

    def grid_decoder(raw: bytes) -> list[float]:
        # deterministic 8x8 "thumbnail" keyed by the first byte (a
        # multiplicative hash per cell — unrelated bases => unrelated
        # gradient patterns), one cell nudged by the second byte
        # (re-encode noise)
        base = raw[0] if raw else 0
        g = [
            (((base + 1) * (i + 1) * 2654435761) % 4096) / 4096.0
            for i in range(64)
        ]
        if len(raw) > 1:
            g[raw[1] % 64] += 0.5
        return g

    assets = spark.createDataFrame(
        [
            ("a1", "image", bytes([10])),
            ("a2", "image", bytes([10, 5])),   # near-dup of a1
            ("a3", "image", bytes([200])),     # unrelated
        ],
        "asset_id string, kind string, payload binary",
    )
    pairs = image_near_dup_pairs(
        assets, decoder=grid_decoder, max_hamming=3, bands=4
    ).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [("a1", "a2")]
    assert pairs[0]["hamming"] <= 2
    # dhash_expr guards
    import pytest as _pt

    with _pt.raises(ValueError, match="pack into"):
        dhash_expr("v", rows=8, cols=9)  # 64 bits > 63


def test_fingerprint_near_dup_pairs_guards(spark):
    from graphragpart1datapipeline_spark.dedup.simhash import (
        fingerprint_near_dup_pairs,
    )

    fp = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 255)], "id long, fp long"
    )
    out = fingerprint_near_dup_pairs(
        fp, id_col="id", max_hamming=1, bands=4, bits=8
    ).collect()
    assert [(r["a"], r["b"], r["hamming"]) for r in out] == [(1, 2, 1)]
    with pytest.raises(ValueError, match="equal chunks"):
        fingerprint_near_dup_pairs(fp, id_col="id", bands=3, bits=8)


def test_stream_maintenance_maintains_pq_codes(spark, tmp_path):
    """With pq_m set at init, the streaming loop folds every increment
    into the compressed codes index; the final codes equal a full
    re-encode of corpus ∪ increments against the FROZEN day-0
    codebook (upsert == rebuild-encode)."""
    import os

    from graphragpart1datapipeline_spark.streaming.maintenance import (
        init_maintenance_state,
        read_maintenance_state,
        stream_maintenance,
    )
    from graphragpart1datapipeline_spark.vector.pq import (
        pq_codebook,
        pq_encode,
    )

    work = str(tmp_path / "work")
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 5.0, 0.0]), (2, [0.0, 1.0, 0.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 5.0, 0.0]), (1, [0.0, 1.0, 0.0, 5.0])],
        "cid long, embedding array<double>",
    )
    init_maintenance_state(docs, emb, cents, work, pq_m=2, pq_ksub=2)

    schema = (
        "doc_id long, text string, embedding array<double>, "
        "seq long, op string"
    )
    src = str(tmp_path / "src")
    inc_rows = [
        (3, "epsilon zeta", [0.9, 0.1, 4.5, 0.2], 100, "U"),
        (4, "eta theta", [0.1, 0.8, 0.3, 4.9], 101, "U"),
    ]
    for i, row in enumerate(inc_rows):
        spark.createDataFrame([row], schema).write.mode("append").json(
            src + f"/f{i}"
        )
    q = stream_maintenance(
        spark.readStream.schema(schema).json(src + "/f*"),
        work,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    state = read_maintenance_state(spark, work)
    assert state["pq"] == os.path.join(work, "pq")
    book = pq_codebook(spark, state["pq"])
    all_emb = emb.unionByName(
        spark.createDataFrame(
            [(r[0], r[2]) for r in inc_rows],
            "vec_id long, embedding array<double>",
        )
    )
    rebuilt = sorted(map(tuple, pq_encode(all_emb, book).collect()))
    persisted = sorted(
        map(tuple, spark.read.parquet(state["pq"]).collect())
    )
    assert persisted == rebuilt


def test_sq8_roundtrip_and_topk(spark):
    from graphragpart1datapipeline_spark.vector.squant import (
        sq8_dequant_expr,
        sq8_encode,
        sq8_stats,
        sq8_topk,
    )

    emb = spark.createDataFrame(
        [
            (1, [0.0, 10.0, 5.0]),
            (2, [1.0, 20.0, 5.0]),   # dim 2 constant -> span 0
            (3, [0.5, 15.0, 5.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    mins, maxs = sq8_stats(emb)
    assert mins == [0.0, 10.0, 5.0] and maxs == [1.0, 20.0, 5.0]
    codes = sq8_encode(emb, mins, maxs)
    got = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert got[1] == [0, 0, 0]       # at the minimum of every dim
    assert got[2] == [255, 255, 0]   # at the maximum; constant dim -> 0
    assert got[3][0] == 128 and got[3][1] == 128  # midpoints round up
    # dequant error bounded by half a quantization step per dim
    dq = {
        r["vec_id"]: r["dv"]
        for r in codes.select(
            "vec_id", sq8_dequant_expr("codes", mins, maxs).alias("dv")
        ).collect()
    }
    for vid, orig in ((1, [0.0, 10.0, 5.0]), (3, [0.5, 15.0, 5.0])):
        for o, d, mn, mx in zip(orig, dq[vid], mins, maxs):
            step = (mx - mn) / 255.0 if mx > mn else 0.0
            assert abs(o - d) <= step / 2 + 1e-12
    # top-k on the quantized corpus ranks the exact-match row first
    top = sq8_topk(codes, mins, maxs, [0.0, 10.0, 5.0], k=3).collect()
    assert [r["vec_id"] for r in top] == [1, 3, 2]
    with pytest.raises(ValueError, match="k must be"):
        sq8_topk(codes, mins, maxs, [0.0, 10.0, 5.0], k=0)
    with pytest.raises(ValueError, match="empty corpus"):
        sq8_stats(emb.filter(F.col("vec_id") > 99))
