"""Round-7 units: the four ADVICE.md (round 6) fixes + new operators.

Covers: hyperball decimal accumulation / regime guard / interpolated
effective diameter (in test_round6_ops.py next to the existing
hyperball suite), ivf_tuned_nprobe spark-side read + under-SLO
loudness, ivf_delete all-deleted refusal, the SemDeDup package
operator, adaptive_join's bounded broadcast probe, the streaming
maintenance loop, and TextRank extractive summarization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE fix (low): ivf_delete must refuse to empty the index
# ---------------------------------------------------------------------------


def test_ivf_delete_refuses_to_empty_index(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_build_index,
        ivf_delete,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, embedding array<float>"
    )
    base = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9]), (12, [0.8, 0.2])],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "ivf_all_del")
    ivf_build_index(base, cents, path)
    everyone = spark.createDataFrame([(10,), (11,), (12,)], "vec_id long")
    with pytest.raises(ValueError, match="empty the index"):
        ivf_delete(path, everyone)
    # the refusal happened BEFORE any write: index and stats intact
    assert spark.read.parquet(path).count() == 3
    stats = spark.read.parquet(path + "_stats").collect()[0]
    assert stats["n"] == 3
    # a partial delete over the same index still works afterwards
    out = ivf_delete(path, spark.createDataFrame([(10,)], "vec_id long"))
    assert sorted(r["vec_id"] for r in out.collect()) == [11, 12]


# ---------------------------------------------------------------------------
# ADVICE fix (low): ivf_tuned_nprobe reads via Spark, not local os.path
# ---------------------------------------------------------------------------


def test_ivf_tuned_nprobe_missing_table_is_friendly(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_tuned_nprobe,
    )

    with pytest.raises(ValueError, match="no tuning table"):
        ivf_tuned_nprobe(spark, str(tmp_path / "nowhere"))


# ---------------------------------------------------------------------------
# SemDeDup as a package operator (verdict task 1)
# ---------------------------------------------------------------------------


def _semdedup_toy(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.001]),  # semantic duplicate of 1
            (3, [0.0, 1.0]),  # distinct
            (4, [0.0, 0.0]),  # zero vector: always a singleton
        ],
        "vec_id long, embedding array<double>",
    )


def test_semdedup_groups_and_survivor_rule(spark):
    from graphragpart1datapipeline_spark.dedup.semantic import semdedup

    emb = _semdedup_toy(spark)
    survivors, groups = semdedup(emb, tau=0.99, k=1)
    g = {r["vec_id"]: r for r in groups.collect()}
    assert set(g) == {1, 2, 3, 4}
    # 1 and 2 collapse; 3 and 4 are singletons rooted at themselves
    assert g[1]["dup_group"] == g[2]["dup_group"] == 1
    assert g[3]["dup_group"] == 3 and g[4]["dup_group"] == 4
    # exactly one survivor per group, and it is the member FARTHEST
    # from the centroid (min cent_cos, tie -> min id)
    s = sorted(r["vec_id"] for r in survivors.collect())
    assert len(s) == 3 and 3 in s and 4 in s
    dup_members = [g[1], g[2]]
    want = min(dup_members, key=lambda r: (r["cent_cos"], r["vec_id"]))
    assert want["survivor"] is True
    other = next(r for r in dup_members if r["vec_id"] != want["vec_id"])
    assert other["survivor"] is False
    # the survivors frame is exactly the flagged projection
    assert {r["vec_id"] for r in survivors.collect()} == {
        v for v, r in g.items() if r["survivor"]
    }


def test_semdedup_default_k_scales_with_corpus(spark):
    from graphragpart1datapipeline_spark.dedup.semantic import semdedup

    emb = _semdedup_toy(spark)
    # n=4, target_cluster_size=2 -> k=2 clusters
    _, groups = semdedup(emb, tau=0.99, target_cluster_size=2)
    assert groups.select("centroid_id").distinct().count() <= 2
    assert groups.count() == 4


def test_semdedup_guards(spark):
    from graphragpart1datapipeline_spark.dedup.semantic import semdedup

    emb = _semdedup_toy(spark)
    with pytest.raises(ValueError, match="tau"):
        semdedup(emb, tau=0.0)
    with pytest.raises(ValueError, match="tau"):
        semdedup(emb, tau=1.5, k=1)
    with pytest.raises(ValueError, match="target_cluster_size"):
        semdedup(emb, tau=0.5, target_cluster_size=0)
    with pytest.raises(ValueError, match="empty corpus"):
        semdedup(emb.limit(0), tau=0.5)


def test_semdedup_upsert_matches_frozen_centroid_recompute(spark):
    """upsert(index(corpus), inc) must equal the full SemDeDup pass
    over corpus ∪ inc with the FROZEN day-0 centroids — checked
    against an independent driver-side replay (cosine assignment,
    within-cluster pairs, union-find closure, argmin survivor), plus
    split-apply associativity."""
    import math as _m

    from graphragpart1datapipeline_spark.dedup.semantic import (
        semdedup_index,
        semdedup_upsert,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.99, 0.01, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.95, 0.05]),
        ],
        "vec_id long, embedding array<double>",
    )
    inc = spark.createDataFrame(
        [
            (10, [1.0, 0.001, 0.0]),  # joins cluster/group of 1-2
            (11, [0.0, 0.0, 1.0]),  # new singleton
            (12, [0.001, 1.0, 0.0]),  # joins 3-4's group
        ],
        "vec_id long, embedding array<double>",
    )
    tau = 0.999
    idx = semdedup_index(corpus, tau=tau, k=2, iters=2, seed=42)
    survivors, groups, idx2 = semdedup_upsert(idx, inc)

    # --- independent driver-side replay over corpus ∪ inc ---
    cents = {
        r["cid"]: r["embedding"] for r in idx["centroids"].collect()
    }
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in corpus.unionByName(inc).collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = _m.sqrt(sum(x * x for x in a))
        nb = _m.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na * nb > 0 else 0.0

    assign = {
        i: min(cents, key=lambda c: (-cos(v, cents[c]), c))
        for i, v in vecs.items()
    }
    parent = {i: i for i in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i < j and assign[i] == assign[j] and cos(
                vecs[i], vecs[j]
            ) >= tau:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want_groups = {i: find(i) for i in ids}
    cent_cos = {
        i: _m.floor(cos(v, cents[assign[i]]) * 1e9 + 0.5) / 1e9
        for i, v in vecs.items()
    }
    want_survivors = set()
    for root in set(want_groups.values()):
        members = [i for i in ids if want_groups[i] == root]
        want_survivors.add(
            min(members, key=lambda i: (cent_cos[i], i))
        )

    got = {r["vec_id"]: r for r in groups.collect()}
    assert {i: r["dup_group"] for i, r in got.items()} == want_groups
    assert {r["vec_id"] for r in survivors.collect()} == want_survivors
    for i, r in got.items():
        assert r["cent_cos"] == cent_cos[i], (i, r["cent_cos"], cent_cos[i])

    # split-apply associativity: one-shot == two increments
    inc_a = inc.filter(F.col("vec_id") < 12)
    inc_b = inc.filter(F.col("vec_id") >= 12)
    _, _, step = semdedup_upsert(idx, inc_a)
    s2, g2, _ = semdedup_upsert(step, inc_b)
    assert sorted(map(tuple, g2.collect())) == sorted(
        map(tuple, groups.collect())
    )
    assert sorted(map(tuple, s2.collect())) == sorted(
        map(tuple, survivors.collect())
    )
    # id-collision gate: re-ingesting a corpus id would silently
    # corrupt groups/survivors — must raise, naming an offender
    with pytest.raises(ValueError, match="id-disjoint") as ei:
        semdedup_upsert(idx2, inc.limit(1))
    assert "10" in str(ei.value)
    # counted-work probe: candidate stream is new-vs-index + new-vs-new
    cand = semdedup_upsert(idx, inc, return_candidates=True)
    assert cand.columns == ["a", "b"] and cand.count() > 0


# ---------------------------------------------------------------------------
# adaptive_join: the broadcast probe must not run the full right plan
# (verdict task 2)
# ---------------------------------------------------------------------------


def test_adaptive_join_probe_is_bounded(spark):
    from graphragpart1datapipeline_spark.operators import adaptive_join

    sc = spark.sparkContext
    acc = sc.accumulator(0)

    def count_partitions(it):
        acc.add(1)
        yield from it

    rdd = (
        sc.parallelize([(i, f"t{i}") for i in range(4000)], 40)
        .mapPartitions(count_partitions, preservesPartitioning=True)
    )
    right = spark.createDataFrame(rdd, "k long, tag string")
    left = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    info: dict = {}
    # probe cap = 51 rows; the first 100-row partition already proves
    # "too big" — CollectLimit must stop after a handful of the 40
    # partitions instead of running the full right plan like count()
    adaptive_join(
        left, right, "k", broadcast_threshold_rows=50, decision=info
    )
    assert info["right_rows"] == 51  # threshold+1 == "more than cap"
    assert info["strategy"] in ("salted", "shuffle")
    assert acc.value < 40, (
        f"broadcast probe executed {acc.value}/40 right partitions — "
        "it must be a bounded incremental take"
    )
    # small right side: the probe is exact and the arm broadcasts
    info = {}
    small = spark.createDataFrame(rdd.take(3), "k long, tag string")
    out = adaptive_join(
        left, small, "k", broadcast_threshold_rows=50, decision=info
    )
    assert info["strategy"] == "broadcast" and info["right_rows"] == 3
    assert out.count() == 3


# ---------------------------------------------------------------------------
# TextRank extractive summarization (verdict task 4)
# ---------------------------------------------------------------------------


def _summary_toy(spark):
    return spark.createDataFrame(
        [
            (1, "g", "Apple banana cherry. Apple banana grape. Kiwi melon."),
        ],
        "doc_id long, community string, text string",
    )


def test_textrank_summary_rule(spark):
    from graphragpart1datapipeline_spark.text.summarize import (
        textrank_summary,
    )

    docs = _summary_toy(spark)
    out = textrank_summary(
        docs, group_col="community", m=3, iters=3, min_overlap=1
    ).collect()
    by_pos = {r["sent_pos"]: r for r in out}
    # sentences 1 and 2 share {apple, banana} -> linked, equal rank > 0;
    # sentence 3 is isolated -> rank 0, selected last
    assert by_pos[1]["rank"] == by_pos[2]["rank"] > 0
    assert by_pos[3]["rank"] == 0
    assert [r["sent_pos"] for r in sorted(out, key=lambda r: r["sel_rank"])] \
        == [1, 2, 3]
    # m truncates: the isolated sentence drops first
    top2 = textrank_summary(
        docs, group_col="community", m=2, iters=3
    ).collect()
    assert sorted(r["sent_pos"] for r in top2) == [1, 2]


def test_textrank_summary_guards(spark):
    from graphragpart1datapipeline_spark.text.summarize import (
        textrank_summary,
    )

    docs = _summary_toy(spark)
    with pytest.raises(ValueError, match="m must be"):
        textrank_summary(docs, group_col="community", m=0)
    with pytest.raises(ValueError, match="min_overlap"):
        textrank_summary(docs, group_col="community", min_overlap=0)
    with pytest.raises(Exception, match="max_group_sentences"):
        textrank_summary(
            docs, group_col="community", max_group_sentences=2
        ).collect()


def test_extractive_generator_closes_t9_seam(spark):
    """generate_with runs in-container with the deterministic TextRank
    generator, and its per-prompt selection agrees with the
    distributed operator's on the same text."""
    from graphragpart1datapipeline_spark.text.llm import (
        extractive_generator,
        generate_with,
    )
    from graphragpart1datapipeline_spark.text.summarize import (
        textrank_summary,
    )

    text = "Apple banana cherry. Apple banana grape. Kiwi melon."
    gen = extractive_generator(m=2)
    assert gen([text]) == ["Apple banana cherry. Apple banana grape"]
    # distributed operator picks the same sentence positions
    docs = _summary_toy(spark)
    dist = {
        r["sent_pos"]
        for r in textrank_summary(
            docs, group_col="community", m=2
        ).collect()
    }
    assert dist == {1, 2}
    # end-to-end through the mapInPandas seam
    out = generate_with(
        docs.select("doc_id", F.col("text").alias("prompt")),
        "prompt",
        generator=extractive_generator(m=1),
    ).collect()
    assert out[0]["summary"] == "Apple banana cherry"
    # empty + all-isolated degrade deterministically
    assert gen([""]) == [""]
    assert extractive_generator(m=2)(["One two. Three four."]) == [
        "One two. Three four"
    ]


# ---------------------------------------------------------------------------
# Drift-triggered rebuild + retune (verdict task 7)
# ---------------------------------------------------------------------------


def test_ivf_rebuild_on_drift_both_arms(spark, tmp_path):
    from graphragpart1datapipeline_spark.vector.search import (
        IvfDriftError,
        ivf_build_index,
        ivf_rebuild_on_drift,
        ivf_tuned_nprobe,
        ivf_upsert,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9]), (12, [0.8, 0.2])],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "drift_idx")
    ivf_build_index(corpus, cents, path)
    # in-distribution increment: the cheap upsert arm fires
    inc_ok = spark.createDataFrame(
        [(20, [0.85, 0.15])], "vec_id long, embedding array<double>"
    )
    res = ivf_rebuild_on_drift(
        path, inc_ok, cents, corpus, [1.0, 0.0], k_centroids=2,
        probes=(1, 2), target_recall=0.5, k=2,
    )
    assert res["action"] == "upsert" and res["nprobe"] is None
    assert res["assignments"].count() == 4
    # drifted increment: assignment cosine collapses -> IvfDriftError
    # from the raw verb, rebuild+retune from the composed one
    inc_bad = spark.createDataFrame(
        [(30, [-1.0, -1.0]), (31, [-0.9, -1.1])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(IvfDriftError):
        ivf_upsert(path, inc_bad, cents)
    res = ivf_rebuild_on_drift(
        path, inc_bad, cents, corpus.unionByName(inc_ok), [1.0, 0.0],
        k_centroids=2, probes=(1, 2), target_recall=0.5, k=2,
    )
    assert res["action"] == "rebuild"
    assert res["nprobe"] in (1, 2)
    # the index at path is the REBUILT one: 6 vectors, retrained cids,
    # and the persisted tuning decision matches the returned nprobe
    assert res["assignments"].count() == 6
    assert ivf_tuned_nprobe(spark, path) == res["nprobe"]
    assert res["tuning"].filter("chosen").count() == 1
    # the index is SELF-DESCRIBING: the persisted centroid table
    # tracked the rebuild, so path-only serving probes the retrained
    # clusters (a stale build-time frame would lose recall silently)
    from graphragpart1datapipeline_spark.vector.search import (
        ivf_centroids,
    )

    persisted = sorted(map(tuple, ivf_centroids(spark, path).collect()))
    returned = sorted(map(tuple, res["centroids"].collect()))
    initial = sorted(map(tuple, cents.collect()))
    assert persisted == returned
    assert persisted != initial  # the rebuild really retrained
    with pytest.raises(ValueError, match="no centroid table"):
        ivf_centroids(spark, str(tmp_path / "no_such_index"))


# ---------------------------------------------------------------------------
# Streaming maintenance state (verdict task 3; end-to-end lock is
# q223's full-rebuild oracle)
# ---------------------------------------------------------------------------


def test_read_maintenance_state_requires_init(spark, tmp_path):
    from graphragpart1datapipeline_spark.streaming.maintenance import (
        read_maintenance_state,
    )

    with pytest.raises(FileNotFoundError):
        read_maintenance_state(spark, str(tmp_path / "never_inited"))


def _maint_toy(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "delta")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, embedding array<double>"
    )
    return docs, emb, cents


def _maint_feed(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, seq int, op string, "
        "embedding array<double>"
    )


def _run_stream(spark, feed_dir, work, cents, ckpt):
    from graphragpart1datapipeline_spark.streaming.maintenance import (
        stream_maintenance,
    )

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, seq int, op string, "
            "embedding array<double>"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    q = stream_maintenance(
        stream, work, cents, threshold=0.3, id_col="doc_id",
        checkpoint_dir=ckpt,
    )
    q.awaitTermination()


def _maint_snapshot(spark, work):
    from graphragpart1datapipeline_spark.operators.relational import cdc_live
    from graphragpart1datapipeline_spark.streaming.maintenance import (
        read_maintenance_state,
    )

    st = read_maintenance_state(spark, work)
    return (
        sorted(map(tuple, cdc_live(st["docs"]).collect())),
        sorted(map(tuple, st["labels"].collect())),
        sorted(
            map(tuple, spark.read.parquet(st["ivf"]).select("vec_id").collect())
        ),
    )


def test_stream_maintenance_delete_supersedes_stale_upsert(spark, tmp_path):
    """A same-batch D with a higher seq must suppress the superseded U
    — the stale row reaches NEITHER the CDC state nor any index."""
    from graphragpart1datapipeline_spark.streaming.maintenance import (
        init_maintenance_state,
    )

    docs, emb, cents = _maint_toy(spark)
    work = str(tmp_path / "maint_d")
    init_maintenance_state(docs, emb, cents, work, threshold=0.3)
    feed = _maint_feed(
        spark,
        [
            (10, "new doc ten", 1, "U", [0.8, 0.2]),
            # id 11: upserted at seq 1 but DELETED at seq 2 in the SAME
            # batch -> must never reach the indexes
            (11, "doomed doc", 1, "U", [0.7, 0.3]),
            (11, None, 2, "D", None),
        ],
    )
    feed_dir = work + "/feed"
    feed.coalesce(1).write.parquet(feed_dir)
    _run_stream(spark, feed_dir, work, cents, work + "/ckpt")
    live_docs, _, ivf_ids = _maint_snapshot(spark, work)
    assert (10, "new doc ten") in live_docs
    assert not any(r[0] == 11 for r in live_docs)  # tombstoned
    assert (10,) in ivf_ids and (11,) not in ivf_ids  # never indexed


def test_stream_maintenance_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-processing the same batch (a
    fresh checkpoint simulates the crash-replay) must converge to the
    identical state — in particular the IVF append is skipped, not
    tripped over its collision gate."""
    from graphragpart1datapipeline_spark.streaming.maintenance import (
        init_maintenance_state,
    )

    docs, emb, cents = _maint_toy(spark)
    work = str(tmp_path / "maint_r")
    init_maintenance_state(docs, emb, cents, work, threshold=0.3)
    feed = _maint_feed(spark, [(20, "replayed doc", 1, "U", [0.6, 0.4])])
    feed_dir = work + "/feed"
    feed.coalesce(1).write.parquet(feed_dir)
    _run_stream(spark, feed_dir, work, cents, work + "/ckpt1")
    first = _maint_snapshot(spark, work)
    # fresh checkpoint -> the SAME file is delivered again (the replay);
    # centroids=None also covers the self-describing path (quantizer
    # read back from the persisted {ivf}_centroids table)
    _run_stream(spark, feed_dir, work, None, work + "/ckpt2")
    assert _maint_snapshot(spark, work) == first


def test_hyperball_interp_t0_and_null_passthrough(spark):
    from graphragpart1datapipeline_spark.graph.hyperball import (
        effective_diameter,
        hyperball_neighborhood_function,
    )

    # threshold met at t=0 -> exact-crossing rational 1/1, so the float
    # formula t-1 + num/den gives diameter 0 (not -1)
    prof = spark.createDataFrame(
        [(0, 1000, 10), (1, 1000, 10)],
        "t long, nf_est_scaled long, n_nodes long",
    )
    r = effective_diameter(prof, (0.5,)).collect()[0]
    assert r["effective_t"] == 0
    assert (r["interp_num"], r["interp_den"]) == (1, 1)
    # an empty graph (self-loops only) yields a NULL profile row, not a
    # spurious 'exceeds 2^62' raise
    e = spark.createDataFrame([(1, 1)], "src long, dst long")
    rows = hyperball_neighborhood_function(
        e, max_t=0, check_regime=False
    ).collect()
    assert rows[0]["nf_est_scaled"] is None and rows[0]["n_nodes"] == 0


def test_textrank_node_key_unambiguous(spark):
    """group='a', id='b:1' must NOT collide with group='a:b', id='1':
    the length-prefixed node key keeps PageRank group-local, so the
    second group's isolated sentence scores 0."""
    from graphragpart1datapipeline_spark.text.summarize import (
        textrank_summary,
    )

    docs = spark.createDataFrame(
        [
            ("b:1", "a", "xray yankee. xray zulu."),  # linked pair
            ("1", "a:b", "quebec romeo."),  # isolated in ITS group
        ],
        "doc_id string, community string, text string",
    )
    out = {
        (r["community"], r["sent_pos"]): r["rank"]
        for r in textrank_summary(
            docs, group_col="community", m=3
        ).collect()
    }
    assert out[("a", 1)] > 0 and out[("a", 2)] > 0
    assert out[("a:b", 1)] == 0  # pre-fix it inherited the merged rank


def test_prune_state_versions_keeps_newest(spark, tmp_path):
    import os

    from graphragpart1datapipeline_spark.streaming.cdc import (
        prune_state_versions,
        read_cdc_state,
    )

    d = str(tmp_path / "state")
    for v in range(5):
        spark.createDataFrame([(v,)], "x long").write.parquet(
            os.path.join(d, f"v{v}")
        )
    deleted = prune_state_versions(spark, d, keep=2)
    assert deleted == [0, 1, 2]
    assert sorted(os.listdir(d)) == ["v3", "v4"]
    # the newest version still reads
    assert read_cdc_state(spark, d).collect()[0]["x"] == 4
    # idempotent, guards, missing dir
    assert prune_state_versions(spark, d, keep=2) == []
    with pytest.raises(ValueError, match="keep must be"):
        prune_state_versions(spark, d, keep=0)
    assert prune_state_versions(spark, str(tmp_path / "nope"), 2) == []


def test_ivf_compact_is_pure_layout(spark, tmp_path):
    import glob

    from graphragpart1datapipeline_spark.vector.search import (
        ivf_build_index,
        ivf_compact,
        ivf_upsert,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, embedding array<double>"
    )
    base = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9])],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "compact_idx")
    ivf_build_index(base, cents, path)
    # three appends -> several small files per cluster partition
    for i, v in enumerate([[0.8, 0.2], [0.7, 0.3], [0.2, 0.8]]):
        ivf_upsert(
            path,
            spark.createDataFrame(
                [(20 + i, v)], "vec_id long, embedding array<double>"
            ),
            cents,
        )
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    stats_before = spark.read.parquet(path + "_stats").collect()
    n_files_before = len(glob.glob(f"{path}/centroid_id=*/part-*"))
    assert n_files_before > 2  # the small-files problem is real here
    out = ivf_compact(spark, path)
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before  # pure layout change
    assert sorted(map(tuple, out.collect())) == before
    assert spark.read.parquet(path + "_stats").collect() == stats_before
    n_files_after = len(glob.glob(f"{path}/centroid_id=*/part-*"))
    assert n_files_after == 2  # one file per cluster
    assert n_files_after < n_files_before
