"""Round-5 batch 3: multi-source BFS, copied-region excision,
JL random projection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bfs_distances
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_bfs_multi_source_min_distance_and_seed(spark):
    """Path 1-2-3-4-5 plus branch 3-6; seeds {1, 5}: every node gets
    the MIN hop distance and the MIN seed id on ties."""
    from graphragpart1datapipeline_spark.graph.bfs import bfs_distances

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (3, 6)])
    got = {
        r["id"]: (r["dist"], r["nearest_seed"])
        for r in bfs_distances(e, _seeds(spark, [1, 5]), max_hops=4).collect()
    }
    assert got == {
        1: (0, 1),
        5: (0, 5),
        2: (1, 1),
        4: (1, 5),
        # node 3 is 2 hops from both seeds -> min seed id wins
        3: (2, 1),
        6: (3, 1),
    }


def test_bfs_respects_max_hops_and_unreachable(spark):
    """Nodes past max_hops and disconnected components are absent from
    the result (a serving tier treats them as 'not nearby')."""
    from graphragpart1datapipeline_spark.graph.bfs import bfs_distances

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {r["id"] for r in bfs_distances(e, _seeds(spark, [1]), max_hops=2).collect()}
    assert got == {1, 2, 3}
    with pytest.raises(ValueError, match="max_hops"):
        bfs_distances(e, _seeds(spark, [1]), max_hops=-1)


def test_bfs_directed_follows_edge_direction(spark):
    from graphragpart1datapipeline_spark.graph.bfs import bfs_distances

    e = _edges(spark, [(1, 2), (3, 2)])
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(
            e, _seeds(spark, [1]), max_hops=3, directed=True
        ).collect()
    }
    assert got == {1: 0, 2: 1}  # 3 unreachable along direction


def test_bfs_matches_python_bfs_on_random_graph(spark):
    """Deterministic pseudo-random graph vs a driver-side BFS."""
    from collections import deque

    from graphragpart1datapipeline_spark.graph.bfs import bfs_distances

    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    nodes = list(range(40))
    pairs = [
        (a, b)
        for a in nodes
        for b in nodes
        if a < b and h(f"e:{a}:{b}") % 13 == 0
    ]
    seeds = [0, 7, 21]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    dist, nearest = {}, {}
    dq = deque()
    for s in sorted(seeds):
        dist[s], nearest[s] = 0, s
        dq.append(s)
    while dq:
        u = dq.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    # nearest seed = min seed at min distance (recompute exactly)
    for v in dist:
        best = None
        for s in seeds:
            # single-source BFS from s
            d2 = {s: 0}
            q2 = deque([s])
            while q2:
                u = q2.popleft()
                for w2 in adj.get(u, []):
                    if w2 not in d2:
                        d2[w2] = d2[u] + 1
                        q2.append(w2)
            if v in d2 and d2[v] == dist[v] and (best is None or s < best):
                best = s
        nearest[v] = best
    expect = {
        v: (d, nearest[v]) for v, d in dist.items() if d <= 5
    }
    got = {
        r["id"]: (r["dist"], r["nearest_seed"])
        for r in bfs_distances(
            _edges(spark, pairs), _seeds(spark, seeds), max_hops=5
        ).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# excise_copy_spans
# ---------------------------------------------------------------------------


def test_excision_removes_copied_region_keeps_first(spark):
    """Doc 2 contains doc 1's passage verbatim: the copied tokens are
    excised from doc 2 ONLY; doc 1 and an unrelated doc are intact."""
    from graphragpart1datapipeline_spark.text.excision import (
        excise_copy_spans,
    )

    passage = " ".join(f"tok{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {passage} gamma delta"),
            (2, f"intro words here {passage} outro words"),
            (3, "completely unrelated text with its own tokens"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in excise_copy_spans(docs, k=5, w=4, min_shared=2).collect()
    }
    assert out[1]["n_removed"] == 0
    assert "tok0" in out[1]["clean_text"]
    assert out[3]["n_removed"] == 0
    # doc 2 lost (most of) the copied passage, kept its own frame
    assert out[2]["n_removed"] >= 20
    assert out[2]["clean_text"].startswith("intro words here")
    assert out[2]["clean_text"].endswith("outro words")
    assert out[2]["n_tokens"] - out[2]["n_removed"] == len(
        out[2]["clean_text"].split()
    )
    # keep-first is idempotent at span level: re-run on cleaned corpus
    cleaned = spark.createDataFrame(
        [(i, out[i]["clean_text"]) for i in (1, 2, 3)],
        "doc_id long, text string",
    )
    again = {
        r["doc_id"]: r["n_removed"]
        for r in excise_copy_spans(cleaned, k=5, w=4, min_shared=2).collect()
    }
    assert again == {1: 0, 2: 0, 3: 0}


def test_excision_overlapping_spans_union(spark):
    """Two partners copy overlapping regions of the same victim: the
    removed position set is the union, tokens are never double-counted."""
    from graphragpart1datapipeline_spark.text.excision import (
        excise_copy_spans,
    )

    block = " ".join(f"w{i}" for i in range(40))
    head = " ".join(f"w{i}" for i in range(25))
    tail = " ".join(f"w{i}" for i in range(15, 40))
    docs = spark.createDataFrame(
        [(1, head), (2, tail), (3, block)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in excise_copy_spans(docs, k=5, w=4, min_shared=2).collect()
    }
    # doc 3 (latest) loses the union of both overlapping copies
    assert out[3]["n_removed"] >= 30
    assert out[3]["n_tokens"] == 40
    assert out[3]["n_removed"] <= 40
    assert out[1]["n_removed"] == 0  # first occurrences survive


def test_excision_precomputed_spans_short_docs(spark):
    """Docs shorter than k tokens are never fingerprinted and pass
    through; a precomputed span frame skips re-detection."""
    from graphragpart1datapipeline_spark.text.analysis import (
        winnow_copy_spans,
    )
    from graphragpart1datapipeline_spark.text.excision import (
        excise_copy_spans,
    )

    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "ok")], "doc_id long, text string"
    )
    spans = winnow_copy_spans(docs, k=5, w=4)
    out = {
        r["doc_id"]: r
        for r in excise_copy_spans(docs, k=5, spans=spans).collect()
    }
    assert out[1]["n_removed"] == 0 and out[1]["clean_text"] == "tiny doc"
    assert out[2]["n_removed"] == 0 and out[2]["clean_text"] == "ok"


# ---------------------------------------------------------------------------
# random_projection
# ---------------------------------------------------------------------------


def test_projection_matches_numpy_and_preserves_dots(spark):
    """Projected values equal the explicit numpy sign-matrix product,
    and the JL dot estimate p_a·p_b/out_dim tracks the true a·b."""
    import numpy as np

    from graphragpart1datapipeline_spark.vector.projection import (
        random_projection,
        sign_matrix,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 64).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    out_dim = 16
    got = {
        r["vec_id"]: np.array(r["proj"])
        for r in random_projection(df, 64, out_dim, seed="jl").collect()
    }
    s = np.array(sign_matrix("jl", 64, out_dim), dtype="float64")  # (16, 64)
    expect = vecs.astype("float64") @ s.T
    for i in range(30):
        assert np.allclose(got[i], expect[i], rtol=1e-12)
    # JL: mean relative error of dot estimates is bounded in practice
    errs = []
    for a in range(10):
        for b in range(a + 1, 10):
            true = float(vecs[a].astype("float64") @ vecs[b])
            est = float(got[a] @ got[b]) / out_dim
            errs.append(abs(est - true))
    norms = [float(np.linalg.norm(vecs[i]) ** 2) for i in range(10)]
    assert sum(errs) / len(errs) < max(norms)  # sanity scale bound


def test_projection_dim_mismatch_raises(spark):
    from graphragpart1datapipeline_spark.vector.projection import (
        random_projection,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="expected dim"):
        random_projection(df, 4, 2).collect()
    with pytest.raises(ValueError, match="dims"):
        random_projection(df, 3, 0)


def test_projection_plan_is_shuffle_free(spark):
    """The projection is a pure row-local expression: optimized plan
    has no Exchange and no Python eval."""
    from graphragpart1datapipeline_spark.vector.projection import (
        random_projection,
    )

    df = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=1) for _ in range(8)]).alias("embedding"),
    )
    plan = random_projection(df, 8, 4)._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_bfs_per_source_distances_matches_per_seed_runs(spark):
    """One multi-source pass == independent single-seed runs, and the
    eccentricity rollup is exact."""
    from graphragpart1datapipeline_spark.graph.bfs import (
        bfs_distances,
        bfs_per_source_distances,
    )

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (3, 6), (10, 11)])
    seeds = [1, 4, 10]
    multi = {
        (r["source"], r["id"]): r["dist"]
        for r in bfs_per_source_distances(
            e, _seeds(spark, seeds), max_hops=5
        ).collect()
    }
    single = {}
    for s in seeds:
        for r in bfs_distances(e, _seeds(spark, [s]), max_hops=5).collect():
            single[(s, r["id"])] = r["dist"]
    assert multi == single
    ecc = {}
    for (s, _), d in multi.items():
        ecc[s] = max(ecc.get(s, 0), d)
    # from 1: 2@1, 3@2, {4,6}@3, 5@4 -> ecc 4; from 4: 1@3; 10-11 pair
    assert ecc == {1: 4, 4: 3, 10: 1}


def test_harmonic_centrality_golden_path(spark):
    """Path 1-2-3-4-5, all 5 sources: harmonic(3) = 2*(1 + 1/2) scaled;
    endpoints get 1 + 1/2 + 1/3 + 1/4 (integer-floored per term)."""
    from graphragpart1datapipeline_spark.graph.bfs import (
        bfs_per_source_distances,
    )

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    d = bfs_per_source_distances(e, _seeds(spark, [1, 2, 3, 4, 5]), max_hops=4)
    got = {
        r["id"]: r["h"]
        for r in d.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(F.sum(F.expr("1000000 DIV dist")).alias("h"))
        .collect()
    }
    # node 3: dists to others = 2,1,1,2 -> 2*1e6 + 2*5e5 = 3_000_000
    assert got[3] == 3_000_000
    # node 1: dists 1,2,3,4 -> 1e6 + 5e5 + 333333 + 250000
    assert got[1] == 1_000_000 + 500_000 + 333_333 + 250_000
    assert got[1] == got[5] and got[2] == got[4]
