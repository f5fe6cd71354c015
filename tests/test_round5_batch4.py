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
