"""Round-6 units: the five ADVICE.md (round 5) fixes + new operators.

Covers: ivf_upsert id-collision gate, mmr_rerank id-type/candidate-cap
contract, row_checks_report empty-input semantics, betweenness decimal
accumulation (regression: existing values unchanged), bm25_query
empty-terms guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE fix 1 (medium): ivf_upsert must not double-count re-ingested ids
# ---------------------------------------------------------------------------


def test_ivf_upsert_raises_on_id_collision(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_build_index,
        ivf_upsert,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, embedding array<float>"
    )
    base = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9]), (12, [0.8, 0.2])],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "ivf_idx")
    ivf_build_index(base, cents, path)
    # disjoint increment still works
    inc_ok = spark.createDataFrame(
        [(20, [0.7, 0.3])], "vec_id long, embedding array<float>"
    )
    out = ivf_upsert(path, inc_ok, cents)
    assert out.count() == 4
    # colliding increment raises loudly, names an offending id
    inc_bad = spark.createDataFrame(
        [(11, [0.2, 0.8]), (21, [0.6, 0.4])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="id-disjoint") as ei:
        ivf_upsert(path, inc_bad, cents)
    assert "11" in str(ei.value)
    # the failed upsert must not have appended anything
    assert spark.read.parquet(path).count() == 4


# ---------------------------------------------------------------------------
# ADVICE fix 2 + verdict task 2: mmr_rerank id type + candidate cap
# ---------------------------------------------------------------------------


def test_mmr_rerank_preserves_string_id_type(spark):
    from graphragpart1datapipeline_spark.vector.mmr import mmr_rerank

    cands = spark.createDataFrame(
        [
            ("doc-a", [1.0, 0.0], 0.9),
            ("doc-b", [0.0, 1.0], 0.8),
            ("doc-c", [1.0, 0.1], 0.7),
        ],
        "doc_id string, embedding array<float>, score double",
    )
    out = mmr_rerank(cands, k=2, id_col="doc_id")
    assert dict(out.dtypes)["doc_id"] == "string"
    got = [r["doc_id"] for r in out.orderBy("rank").collect()]
    assert got == ["doc-a", "doc-b"]


def test_mmr_rerank_candidate_cap_enforced(spark):
    from graphragpart1datapipeline_spark.vector.mmr import mmr_rerank

    cands = spark.createDataFrame(
        [(i, [float(i), 1.0], 0.5) for i in range(12)],
        "vec_id long, embedding array<float>, score double",
    )
    with pytest.raises(ValueError, match="max_candidates"):
        mmr_rerank(cands, k=2, max_candidates=10)
    # explicit raise of the cap admits the same frame
    assert mmr_rerank(cands, k=2, max_candidates=12).count() == 2
    with pytest.raises(ValueError, match="max_candidates must be"):
        mmr_rerank(cands, k=2, max_candidates=0)


# ---------------------------------------------------------------------------
# ADVICE fix 3: empty input reports violations=0 / passed=true, not NULL
# ---------------------------------------------------------------------------


def test_row_checks_report_empty_input_is_unambiguous(spark):
    from graphragpart1datapipeline_spark.operators.quality import (
        row_checks_report,
    )

    df = spark.createDataFrame([], "x long, y string").filter(F.lit(False))
    rows = row_checks_report(
        df, [("x_null", F.col("x").isNull()), ("y_empty", F.col("y") == "")]
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_rows"] == 0
        assert r["violations"] == 0
        assert r["passed"] is True


# ---------------------------------------------------------------------------
# ADVICE fix 4: betweenness decimal accumulation — values unchanged on a
# known graph (path graph: middle node brokers everything)
# ---------------------------------------------------------------------------


def test_betweenness_decimal_sum_regression(spark):
    from graphragpart1datapipeline_spark.graph.betweenness import (
        betweenness_sampled,
    )

    # path 0-1-2: from sources {0, 2}, node 1 carries dependency 1.0
    # from each side -> bc_scaled = 2 * SCALE
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    srcs = spark.createDataFrame([(0,), (2,)], "id long")
    got = {
        r["id"]: r["bc_scaled"]
        for r in betweenness_sampled(e, srcs, max_hops=3).collect()
    }
    assert got[1] == 2 * 10**6
    assert dict(
        betweenness_sampled(e, srcs, max_hops=3).dtypes
    )["bc_scaled"] == "bigint"


# ---------------------------------------------------------------------------
# ADVICE fix 5: bm25_query empty terms raises up front
# ---------------------------------------------------------------------------


def test_bm25_query_empty_terms_raises(spark):
    from graphragpart1datapipeline_spark.text.bm25_index import (
        bm25_index,
        bm25_query,
    )

    ix = bm25_index(
        spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    )
    with pytest.raises(ValueError, match="terms is empty"):
        bm25_query(ix, [])


# ---------------------------------------------------------------------------
# ivf_tune (verdict task 4)
# ---------------------------------------------------------------------------


def _toy_index(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.search import ivf_build_index

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, embedding array<float>"
    )
    corpus = spark.createDataFrame(
        [
            (10, [0.9, 0.1]),
            (11, [0.8, 0.2]),
            (12, [0.1, 0.9]),
            (13, [0.2, 0.8]),
        ],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "tune_idx")
    assign = ivf_build_index(corpus, cents, path)
    return corpus, cents, path, assign


def test_ivf_tune_picks_smallest_sufficient_nprobe(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_tune,
        ivf_tuned_nprobe,
    )

    corpus, cents, path, assign = _toy_index(spark, tmp_path)
    # query near centroid 0: its own cluster holds only 2 of the top-4
    # (k=4 wants all vectors) -> nprobe=1 recall 0.5, nprobe=2 recall 1
    tbl = ivf_tune(
        corpus, [1.0, 0.0], cents, path, k=4, target_recall=0.9,
        probes=(1, 2), assignments=assign,
    ).orderBy("nprobe").collect()
    assert [(r["nprobe"], r["chosen"]) for r in tbl] == [(1, False), (2, True)]
    assert tbl[0]["recall"] == 0.5 and tbl[1]["recall"] == 1.0
    assert ivf_tuned_nprobe(spark, path) == 2


def test_ivf_tune_fallback_and_guards(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_tune,
        ivf_tuned_nprobe,
    )

    corpus, cents, path, assign = _toy_index(spark, tmp_path)
    # unreachable target: nprobe=1 can never reach recall 1 for k=4 —
    # falls back to the LARGEST candidate, loudly chosen in the table
    tbl = ivf_tune(
        corpus, [1.0, 0.0], cents, path, k=4, target_recall=1.0,
        probes=(1,), assignments=assign,
    ).collect()
    assert tbl[0]["chosen"] is True and tbl[0]["recall"] == 0.5
    # the under-SLO decision is loud AT THE CONSUMER (round-6 advice):
    # warn by default, raise under strict
    with pytest.warns(UserWarning, match="UNDER-SLO"):
        assert ivf_tuned_nprobe(spark, path) == 1
    with pytest.raises(ValueError, match="UNDER-SLO"):
        ivf_tuned_nprobe(spark, path, strict=True)
    with pytest.raises(ValueError, match="probes is empty"):
        ivf_tune(corpus, [1.0, 0.0], cents, path, probes=())
    with pytest.raises(ValueError, match="target_recall"):
        ivf_tune(corpus, [1.0, 0.0], cents, path, target_recall=0.0)
    with pytest.raises(ValueError, match="no tuning table"):
        ivf_tuned_nprobe(spark, str(tmp_path / "never_tuned"))


# ---------------------------------------------------------------------------
# Quantile sketch (verdict task 5)
# ---------------------------------------------------------------------------


def test_quantile_sketch_merge_equals_build(spark):
    from graphragpart1datapipeline_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_merge,
        quantile_sketch_query,
    )

    rows = [(i, float((i * 37) % 1000), "g%d" % (i % 2)) for i in range(500)]
    df = spark.createDataFrame(rows, "rid long, v double, g string")
    t = 64
    one_shot = quantile_sketch_build(df, "v", "rid", ["g"], t=t)
    shards = [
        quantile_sketch_build(
            df.filter(F.col("rid") % 3 == i), "v", "rid", ["g"], t=t
        )
        for i in range(3)
    ]
    u = shards[0]
    for s in shards[1:]:
        u = u.unionByName(s)
    merged = quantile_sketch_merge(u, ["g"], t=t)
    a = {tuple(r) for r in one_shot.collect()}
    b = {tuple(r) for r in merged.collect()}
    assert a == b  # merge(shard sketches) == sketch(all rows), exactly
    qa = {tuple(r) for r in quantile_sketch_query(one_shot, [0.5], ["g"]).collect()}
    qb = {tuple(r) for r in quantile_sketch_query(merged, [0.5], ["g"]).collect()}
    assert qa == qb


def test_quantile_sketch_rank_error_bound(spark):
    """Sampled quantile vs exact: rank error well inside O(1/sqrt(t))."""
    from graphragpart1datapipeline_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_query,
    )

    n, t = 5000, 256
    rows = [(i, float((i * 7919) % n)) for i in range(n)]  # permutation
    df = spark.createDataFrame(rows, "rid long, v double")
    sk = quantile_sketch_build(df, "v", "rid", t=t)
    got = {
        r["q_milli"]: r["q_value"]
        for r in quantile_sketch_query(sk, [0.1, 0.5, 0.9]).collect()
    }
    for milli, qv in got.items():
        true_rank = qv / (n - 1)  # values are 0..n-1, rank == value/(n-1)
        assert abs(true_rank - milli / 1000.0) < 0.12, (milli, qv)


def test_quantile_sketch_guards(spark):
    from graphragpart1datapipeline_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_query,
    )

    df = spark.createDataFrame([(1, 1.0)], "rid long, v double")
    with pytest.raises(ValueError, match="t must be"):
        quantile_sketch_build(df, "v", "rid", t=0)
    sk = quantile_sketch_build(df, "v", "rid")
    with pytest.raises(ValueError, match="qs is empty"):
        quantile_sketch_query(sk, [])
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        quantile_sketch_query(sk, [1.5])


# ---------------------------------------------------------------------------
# HyperBall (verdict task 6)
# ---------------------------------------------------------------------------


def test_hyperball_registers_equal_ball_max(spark):
    """On a path graph the t-radius registers must equal the max-rho
    one-hots of the true ball members — propagation is exact."""
    from graphragpart1datapipeline_spark.graph.hyperball import (
        hyperball_registers,
    )
    from graphragpart1datapipeline_spark.operators.sketches import kmv_hash

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    regs = hyperball_registers(e, max_t=2, p=4, directed=False)
    # expected: ball(v, t) under the undirected path
    balls = {
        0: {0, 1, 2}, 1: {0, 1, 2, 3}, 2: {0, 1, 2, 3}, 3: {1, 2, 3}
    }
    onehot = {
        r["node"]: (r["register"], r["rho"])
        for r in spark.createDataFrame(
            [(i,) for i in range(4)], "node long"
        ).select(
            "node",
            (kmv_hash(F.col("node")) % 16).alias("register"),
            (
                F.lit(57)
                - F.when(
                    F.shiftright(kmv_hash(F.col("node")), 4) == 0, F.lit(0)
                ).otherwise(
                    F.length(
                        F.conv(
                            F.shiftright(kmv_hash(F.col("node")), 4), 10, 2
                        )
                    )
                )
            ).cast("int").alias("rho"),
        ).collect()
    }
    got = {
        (r["node"], r["register"]): r["rho"] for r in regs[2].collect()
    }
    want: dict = {}
    for v, members in balls.items():
        for u in members:
            reg, rho = onehot[u]
            key = (v, reg)
            want[key] = max(want.get(key, 0), rho)
    assert got == want


def test_hyperball_regime_guard(spark):
    """A tiny graph (every ball far below 2.5*2^p) must trip the raw-
    estimator regime warning; check_regime=False keeps it quiet."""
    import warnings as _w

    from graphragpart1datapipeline_spark.graph.hyperball import (
        hyperball_neighborhood_function,
    )

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        hyperball_neighborhood_function(e, max_t=1, p=4).collect()
    assert any("raw-HLL regime" in str(x.message) for x in rec)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        hyperball_neighborhood_function(
            e, max_t=1, p=4, check_regime=False
        ).collect()
    assert not any("raw-HLL regime" in str(x.message) for x in rec)


def test_hyperball_estimate_tracks_exact_nf(spark, sf_dir):
    """At sf0.001 the t>=1 neighborhood-function estimates must land
    within the raw-HLL error envelope of the exact BFS counts."""
    from graphragpart1datapipeline_spark.sources import read_table
    import __spark_entry__ as em

    rows = em.queries()["q213_hyperball_profile"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r["t"] for r in rows] == [0, 1, 2]
    for r in rows:
        if r["t"] == 0:
            continue  # single-element balls are far below the raw regime
        est = r["nf_est_scaled"] / 1e6
        assert abs(est - r["nf_exact"]) / r["nf_exact"] < 0.35, r
    # NF is monotone in t (balls only grow)
    assert rows[0]["nf_exact"] <= rows[1]["nf_exact"] <= rows[2]["nf_exact"]
    assert (
        rows[0]["nf_est_scaled"]
        <= rows[1]["nf_est_scaled"]
        <= rows[2]["nf_est_scaled"]
    )


# ---------------------------------------------------------------------------
# Shared-detection salting (verdict task 7)
# ---------------------------------------------------------------------------


def test_salted_join_precomputed_hot_keys(spark):
    from graphragpart1datapipeline_spark.operators import (
        hot_key_table,
        salted_join_auto,
    )
    from graphragpart1datapipeline_spark.operators.skew import (
        join_skew_report,
    )

    left = spark.createDataFrame(
        [(0 if i % 4 == 0 else i, float(i)) for i in range(400)],
        "k long, v double",
    )
    right = spark.createDataFrame(
        [(0, "hot"), (1, "a"), (2, "b"), (3, "c")], "k long, tag string"
    )
    hot = hot_key_table(left, "k", threshold_frac=0.05).localCheckpoint(
        eager=True
    )
    auto = salted_join_auto(left, right, "k", threshold_frac=0.05)
    pre = salted_join_auto(
        left, right, "k", threshold_frac=0.05, hot_keys=hot
    )
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, pre.collect())
    )
    # the consumer's plan carries no Misra-Gries detection stage
    assert "ArrowEvalPython" not in pre._jdf.queryExecution().executedPlan().toString()
    # the report consumes the same artifact and matches the self-detect path
    r_auto = join_skew_report(left, "k", threshold_frac=0.05).collect()
    r_pre = join_skew_report(
        left, "k", threshold_frac=0.05, hot_keys=hot
    ).collect()
    assert r_auto == r_pre
    assert r_pre[0]["hot_keys"] == 1 and r_pre[0]["recommended_salt"] >= 1
    # schema validation is loud
    bad = hot.drop("__n")
    with pytest.raises(ValueError, match="missing columns"):
        salted_join_auto(left, right, "k", hot_keys=bad)
    with pytest.raises(ValueError, match="missing columns"):
        join_skew_report(left, "k", hot_keys=bad)


# ---------------------------------------------------------------------------
# Index deletion family (round-6 extras): bm25_delete, ivf_delete
# ---------------------------------------------------------------------------


def test_bm25_delete_equals_rebuild(spark):
    from graphragpart1datapipeline_spark.text.bm25_index import (
        bm25_delete,
        bm25_index,
        bm25_query,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha alpha delta"),
            (3, "beta delta epsilon"),
            (4, "gamma gamma gamma"),
        ],
        "doc_id long, text string",
    )
    kill = spark.createDataFrame([(2,), (4,), (99,)], "doc_id long")
    after = bm25_delete(bm25_index(docs), kill)
    rebuilt = bm25_index(docs.filter(~F.col("doc_id").isin(2, 4)))
    for tbl in ("postings", "dl", "dfreq"):
        a = sorted(map(tuple, after[tbl].collect()))
        b = sorted(map(tuple, rebuilt[tbl].collect()))
        assert a == b, tbl
    qa = bm25_query(after, ["alpha", "beta"], k=5, log_idf=False).collect()
    qb = bm25_query(rebuilt, ["alpha", "beta"], k=5, log_idf=False).collect()
    assert list(map(tuple, qa)) == list(map(tuple, qb))
    # terms only present in deleted docs vanish entirely (df 0 rows)
    assert after["dfreq"].filter(F.col("term") == "gamma").count() == 1
    # (gamma survives via doc 1); a term exclusive to doc 2/4 would drop


def test_ivf_delete_partition_local(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_build_index,
        ivf_delete,
        ivf_upsert,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, embedding array<float>"
    )
    base = spark.createDataFrame(
        [
            (10, [0.9, 0.1]),
            (11, [0.8, 0.2]),
            (12, [0.1, 0.9]),
            (13, [0.2, 0.8]),
        ],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "del_idx")
    ivf_build_index(base, cents, path)
    out = ivf_delete(
        path, spark.createDataFrame([(11,), (99,)], "vec_id long")
    )
    assert sorted(r["vec_id"] for r in out.collect()) == [10, 12, 13]
    # stats n decremented, mean kept
    st = spark.read.parquet(path + "_stats").collect()[0]
    assert st["n"] == 3
    # a freed id can be re-ingested afterwards (upsert collision gate
    # sees the post-delete index)
    re_add = spark.createDataFrame(
        [(11, [0.7, 0.3])], "vec_id long, embedding array<float>"
    )
    out2 = ivf_upsert(path, re_add, cents)
    assert sorted(r["vec_id"] for r in out2.collect()) == [10, 11, 12, 13]
    # deleting ids nobody has is a clean no-op
    out3 = ivf_delete(
        path, spark.createDataFrame([(777,)], "vec_id long")
    )
    assert out3.count() == 4


# ---------------------------------------------------------------------------
# Round-6 extras: multi-query batch ANN, dedup-index deletion
# ---------------------------------------------------------------------------


def test_multi_query_topk_equals_per_query_calls(spark):
    from graphragpart1datapipeline_spark.vector.search import (
        cosine_topk,
        multi_query_topk,
    )
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    corpus = spark.createDataFrame(
        [
            (i, [((h(f"{i}:{j}") % 2000) - 1000) / 1000.0 for j in range(6)])
            for i in range(30)
        ],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.filter(F.col("vec_id").isin(3, 17)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = multi_query_topk(corpus, queries, k=4).collect()
    for qid in (3, 17):
        qvec = [
            ((h(f"{qid}:{j}") % 2000) - 1000) / 1000.0 for j in range(6)
        ]
        solo = cosine_topk(corpus, qvec, k=4).select(
            "vec_id", "score"
        ).collect()
        got = sorted(
            (r["rank"], r["vec_id"], r["score"])
            for r in batch
            if r["query_id"] == qid
        )
        want = [
            (i + 1, r["vec_id"], r["score"]) for i, r in enumerate(solo)
        ]
        # qvec literal vs stored float32 row: cosine_topk casts the
        # PYTHON floats; the stored floats round-trip identically here
        assert [(g[1]) for g in got] == [w[1] for w in want]
        for g, w in zip(got, want):
            assert abs(g[2] - w[2]) < 1e-6


def test_embedding_lsh_delete_equals_rebuild(spark):
    from graphragpart1datapipeline_spark.dedup import (
        embedding_lsh_delete,
        embedding_lsh_index,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11 - 5) for j in range(8)])
         for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    ix = embedding_lsh_index(emb, dim=8)
    kill = spark.createDataFrame([(5,), (11,), (999,)], "vec_id long")
    after = embedding_lsh_delete(ix, kill)
    rebuilt = embedding_lsh_index(
        emb.filter(~F.col("vec_id").isin(5, 11)), dim=8
    )
    a = sorted(map(tuple, after["buckets"].collect()))
    b = sorted(map(tuple, rebuilt["buckets"].collect()))
    assert a == b


def test_set_similarity_delete_probe_contract(spark):
    """delete-then-probe == rebuild-then-probe on VERIFIED PAIRS (the
    frozen token order intentionally differs from a fresh rebuild's —
    prefix filtering is lossless under any consistent order)."""
    from graphragpart1datapipeline_spark.dedup import (
        set_similarity_delete,
        set_similarity_index,
        set_similarity_join_incremental,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "zeta eta theta iota"),
            (4, "alpha beta gamma delta"),
        ],
        "rid long, text string",
    )
    probe = spark.createDataFrame(
        [(100, "alpha beta gamma delta kappa"),
         (101, "zeta eta theta lambda")],
        "rid long, text string",
    )
    ix = set_similarity_index(corpus, "rid", "text")
    kill = spark.createDataFrame([(2,), (3,)], "rid long")
    after = set_similarity_delete(ix, kill)
    # members shrink; the duplicate class {1,4} survives intact
    assert sorted(
        r["rid"] for r in after["members"].collect()
    ) == [1, 4]
    got = sorted(
        (r["new_id"], r["corpus_id"])
        for r in set_similarity_join_incremental(
            probe, after, "rid", "text"
        ).collect()
    )
    rebuilt = set_similarity_index(
        corpus.filter(~F.col("rid").isin(2, 3)), "rid", "text"
    )
    want = sorted(
        (r["new_id"], r["corpus_id"])
        for r in set_similarity_join_incremental(
            probe, rebuilt, "rid", "text"
        ).collect()
    )
    assert got == want and (100, 1) in got and (100, 4) in got
    # deleting the last member of a class removes its reps/prefix rows
    dead_cids = after["reps"].count()
    assert dead_cids == rebuilt["reps"].count()


def test_ivf_delete_emptied_cluster(spark, tmp_path):
    """Deleting every vector of a cluster must remove its partition —
    dynamic overwrite alone would silently keep the old files."""
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_build_index,
        ivf_delete,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, embedding array<float>"
    )
    base = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.8, 0.2]), (12, [0.1, 0.9])],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "empty_idx")
    ivf_build_index(base, cents, path)
    # 10 and 11 are cluster 0's ONLY members
    out = ivf_delete(
        path, spark.createDataFrame([(10,), (11,)], "vec_id long")
    )
    assert sorted(r["vec_id"] for r in out.collect()) == [12]
    assert spark.read.parquet(path).count() == 1


def test_adaptive_join_arm_selection_and_equivalence(spark):
    from graphragpart1datapipeline_spark.operators import adaptive_join

    left = spark.createDataFrame(
        [(0 if i % 4 == 0 else i, float(i)) for i in range(400)],
        "k long, v double",
    )
    small = spark.createDataFrame(
        [(0, "hot"), (1, "a"), (2, "b")], "k long, tag string"
    )
    big = spark.createDataFrame(
        [(i, f"t{i}") for i in range(400)], "k long, tag string"
    )
    plain_left = spark.createDataFrame(
        [(i, float(i)) for i in range(400)], "k long, v double"
    )

    def run(lf, rt, **kw):
        info: dict = {}
        out = adaptive_join(lf, rt, "k", decision=info, **kw)
        return info, sorted(map(tuple, out.collect()))

    info, got = run(left, small, broadcast_threshold_rows=10)
    assert info["strategy"] == "broadcast"
    assert got == sorted(map(tuple, left.join(small, "k").collect()))

    info, got = run(
        left, big, broadcast_threshold_rows=10, threshold_frac=0.05
    )
    assert info["strategy"] == "salted" and info["hot_keys"] == 1
    assert got == sorted(map(tuple, left.join(big, "k").collect()))

    info, got = run(
        plain_left, big, broadcast_threshold_rows=10, threshold_frac=0.05
    )
    assert info["strategy"] == "shuffle" and info["hot_keys"] == 0
    assert got == sorted(map(tuple, plain_left.join(big, "k").collect()))

    with pytest.raises(ValueError, match="does not support how"):
        adaptive_join(left, small, "k", how="full")
    # broadcast arm's physical plan really broadcasts
    plan = (
        adaptive_join(left, small, "k", broadcast_threshold_rows=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_effective_diameter_decision(spark):
    from graphragpart1datapipeline_spark.graph.hyperball import (
        effective_diameter,
    )

    prof = spark.createDataFrame(
        [(0, 100, 10), (1, 500, 10), (2, 900, 10), (3, 1000, 10)],
        "t long, nf_est_scaled long, n_nodes long",
    )
    rows = {
        r["q_milli"]: r
        for r in effective_diameter(prof, (0.5, 0.75, 0.9, 1.0)).collect()
    }
    got = {q: r["effective_t"] for q, r in rows.items()}
    assert got == {500: 1, 750: 2, 900: 2, 1000: 3}
    # Boldi-Vigna interpolation as an exact rational over the scaled
    # profile: diameter = (t-1) + num/den
    # q=0.75: crosses between N(1)=500 and N(2)=900 at
    #   (750-500)/(900-500) = 0.625 -> 1.625
    r = rows[750]
    assert (r["interp_num"], r["interp_den"]) == (250_000, 400_000)
    # q=0.5 lands exactly on N(1) -> fraction 1, diameter 0 + 1 = 1
    r = rows[500]
    assert r["interp_num"] == r["interp_den"] == 400_000
    import pytest as _pt

    with _pt.raises(ValueError, match="qs is empty"):
        effective_diameter(prof, ())
    with _pt.raises(ValueError, match="quantiles"):
        effective_diameter(prof, (0.0,))
