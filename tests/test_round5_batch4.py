"""Round-5 batch 4: DBSCAN from pair frames, native streaming dedup
within watermark."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_dbscan_two_clusters_border_noise(spark):
    """Hand-built ε-graph: a 4-clique and a path, one border point on
    each, one isolated noise point. min_pts=3 (self included)."""
    from graphragpart1datapipeline_spark.vector.dbscan import (
        dbscan_from_pairs,
    )

    # cluster A: 1-2-3-4 clique (all deg 3 -> core);
    # 5 touches only 1 (deg 1 -> border of A)
    # cluster B: 10-11, 11-12, 10-12 triangle (deg 2 -> core at min_pts=3)
    # 20 isolated -> noise; 21-22 lone pair -> deg 1 each -> noise
    p = _pairs(
        spark,
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5),
         (10, 11), (11, 12), (10, 12), (21, 22)],
    )
    nodes = _nodes(spark, [1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 22])
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan_from_pairs(nodes, p, min_pts=3).collect()
    }
    assert got[1] == (1, "core") and got[4] == (1, "core")
    assert got[5] == (1, "border")
    assert got[10] == (10, "core") and got[12] == (10, "core")
    assert got[20] == (None, "noise")
    assert got[21] == (None, "noise") and got[22] == (None, "noise")


def test_dbscan_min_pts_edges(spark):
    """min_pts=1: every point (even isolated) is its own core cluster.
    min_pts=2: pairs cluster, singletons are noise. Invalid raises."""
    from graphragpart1datapipeline_spark.vector.dbscan import (
        dbscan_from_pairs,
    )

    p = _pairs(spark, [(1, 2)])
    nodes = _nodes(spark, [1, 2, 3])
    g1 = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan_from_pairs(nodes, p, min_pts=1).collect()
    }
    assert g1 == {1: (1, "core"), 2: (1, "core"), 3: (3, "core")}
    g2 = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan_from_pairs(nodes, p, min_pts=2).collect()
    }
    assert g2 == {1: (1, "core"), 2: (1, "core"), 3: (None, "noise")}
    with pytest.raises(ValueError, match="min_pts"):
        dbscan_from_pairs(nodes, p, min_pts=0)


def test_dbscan_matches_sklearn_semantics_bruteforce(spark):
    """Pseudo-random ε-graph vs a driver-side reference DBSCAN
    (core = deg+1 >= min_pts; clusters = CCs of core subgraph; border
    attaches to min cluster among core neighbors)."""
    import hashlib

    from graphragpart1datapipeline_spark.vector.dbscan import (
        dbscan_from_pairs,
    )

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    n = 60
    pairs = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if h(f"d:{a}:{b}") % 29 == 0
    ]
    min_pts = 3
    adj = {i: set() for i in range(n)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    core = {i for i in range(n) if len(adj[i]) + 1 >= min_pts}
    # CC over core subgraph
    cluster = {}
    for s in sorted(core):
        if s in cluster:
            continue
        stack, comp = [s], []
        seen = {s}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        root = min(comp)
        for u in comp:
            cluster[u] = root
    expect = {}
    for i in range(n):
        if i in core:
            expect[i] = (cluster[i], "core")
        else:
            cns = [cluster[v] for v in adj[i] if v in core]
            if cns:
                expect[i] = (min(cns), "border")
            else:
                expect[i] = (None, "noise")
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan_from_pairs(
            _nodes(spark, range(n)), _pairs(spark, pairs), min_pts=min_pts
        ).collect()
    }
    assert got == expect


def test_stream_dedup_within_watermark_matches_batch_keys(spark, tmp_path):
    """availableNow drain of dropDuplicatesWithinWatermark: surviving
    key set == batch DISTINCT keys (all events inside one watermark)."""
    from graphragpart1datapipeline_spark.streaming.dedup import (
        stream_dedup_counts,
        stream_dedup_within_watermark,
    )

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=i % 7), i % 5, f"t{i % 3}")
        for i in range(60)
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    src = str(tmp_path / "ev_src")
    batch.write.parquet(src)
    sdf = spark.readStream.schema(batch.schema).parquet(src)
    out = stream_dedup_counts(
        sdf, ["user_id", "event_type"], ts_col="ts", watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dd_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["event_type"])
        for r in spark.sql("SELECT * FROM dd_sink").collect()
    }
    expect = {
        (r["user_id"], r["event_type"])
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert got == expect
    # each key appears exactly once
    assert spark.sql("SELECT COUNT(*) FROM dd_sink").collect()[0][0] == len(
        expect
    )
    # guards
    with pytest.raises(ValueError, match="key_cols"):
        stream_dedup_within_watermark(sdf, [])
    with pytest.raises(ValueError, match="streaming"):
        stream_dedup_within_watermark(batch, ["user_id"])


# ---------------------------------------------------------------------------
# MMR re-ranking
# ---------------------------------------------------------------------------


def test_mmr_diversifies_near_duplicates(spark):
    """Three near-identical high-relevance vectors + one orthogonal
    lower-relevance vector: pure relevance keeps all three clones;
    MMR picks one clone then the orthogonal doc."""
    from graphragpart1datapipeline_spark.vector.mmr import mmr_rerank

    rows = [
        (1, [1.0, 0.0], 0.99),
        (2, [1.0, 0.001], 0.98),   # clone of 1
        (3, [1.0, -0.001], 0.97),  # clone of 1
        (4, [0.0, 1.0], 0.60),     # orthogonal, less relevant
    ]
    cands = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, score double"
    )
    got = [
        (r["rank"], r["vec_id"])
        for r in mmr_rerank(cands, k=3, lam=0.7).orderBy("rank").collect()
    ]
    assert got[0] == (1, 1)        # best relevance first
    assert got[1] == (2, 4)        # diversity beats the clones
    assert got[2][1] in (2, 3)     # then a clone comes back
    import pytest as _pt

    with _pt.raises(ValueError, match="k must"):
        mmr_rerank(cands, k=0)
    with _pt.raises(ValueError, match="lambda"):
        mmr_rerank(cands, lam=1.5)


def test_mmr_matches_driver_greedy(spark):
    """Pseudo-random candidates vs an exact driver-side greedy MMR."""
    import hashlib
    import math

    from graphragpart1datapipeline_spark.vector.mmr import mmr_rerank

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    n, d, lam, k = 15, 6, 0.7, 6
    vecs = {
        i: [((h(f"v:{i}:{j}") % 2000) - 1000) / 1000.0 for j in range(d)]
        for i in range(n)
    }
    rel = {i: (h(f"r:{i}") % 1000) / 1000.0 for i in range(n)}

    def unit(v):
        nm = math.sqrt(sum(x * x for x in v))
        return [x / nm for x in v] if nm > 0 else None

    u = {i: unit(v) for i, v in vecs.items()}

    def dot(a, b):
        if a is None or b is None:
            return 0.0
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    picked = []
    remaining = set(range(n))
    for _ in range(k):
        best = None
        for c in sorted(remaining):
            if not picked:
                s = lam * rel[c]
            else:
                s = lam * rel[c] - (1.0 - lam) * max(
                    dot(u[c], u[p]) for p in picked
                )
            if best is None or s > best[1] or (s == best[1] and c < best[0]):
                if best is None or s > best[1]:
                    best = (c, s)
        picked.append(best[0])
        remaining.discard(best[0])

    cands = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], rel[i]) for i in range(n)],
        "vec_id long, embedding array<float>, score double",
    )
    got = [
        r["vec_id"]
        for r in mmr_rerank(cands, k=k, lam=lam).orderBy("rank").collect()
    ]
    assert got == picked
