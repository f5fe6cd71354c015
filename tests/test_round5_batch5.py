"""Round-5 batch 5: hop-bounded sampled Brandes betweenness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _srcs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _brandes_float(pairs, sources, max_hops, directed=False):
    """Driver-side float Brandes, hop-bounded — the reference."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        if not directed:
            adj[b].add(a)
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = [s]
        dq = deque([s])
        while dq:
            u = dq.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
                    order.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if v in dist and dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s and delta[w] == 0.0:
                delta[w] += 0.0
        for v in order:
            if v != s:
                bc[v] += delta[v]
    return dict(bc)


def test_betweenness_path_graph_golden(spark):
    """Path 1-2-3-4-5, all sources: directed-dependency sums are the
    classic values doubled (each unordered pair counted once per
    endpoint): bc(3)=8, bc(2)=bc(4)=6, endpoints 0."""
    from graphragpart1datapipeline_spark.graph.betweenness import (
        betweenness_sampled,
    )

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {
        r["id"]: r["bc_scaled"]
        for r in betweenness_sampled(
            e, _srcs(spark, [1, 2, 3, 4, 5]), max_hops=4, scale=10**6
        ).collect()
    }
    s = 10**6
    assert got[3] == 8 * s
    assert got[2] == 6 * s and got[4] == 6 * s
    assert got[1] == 0 and got[5] == 0


def test_betweenness_star_and_guards(spark):
    """Star center brokers every leaf pair; max_hops guard raises."""
    from graphragpart1datapipeline_spark.graph.betweenness import (
        betweenness_sampled,
    )

    e = _edges(spark, [(0, i) for i in range(1, 6)])
    got = {
        r["id"]: r["bc_scaled"]
        for r in betweenness_sampled(
            e, _srcs(spark, range(6)), max_hops=2, scale=10**6
        ).collect()
    }
    # center: 5 sources (leaves) x 4 other leaves each = 20 dependencies
    assert got[0] == 20 * 10**6
    for leaf in range(1, 6):
        assert got[leaf] == 0
    with pytest.raises(ValueError, match="max_hops"):
        betweenness_sampled(e, _srcs(spark, [0]), max_hops=0)


def test_betweenness_matches_float_brandes_on_random_graph(spark):
    """Pseudo-random graph, sampled sources: scaled-integer result is
    within the documented floor-truncation bound of float Brandes."""
    import hashlib

    from graphragpart1datapipeline_spark.graph.betweenness import (
        betweenness_sampled,
    )

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    n = 40
    pairs = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if h(f"bw:{a}:{b}") % 11 == 0
    ]
    sources = [0, 9, 17, 33]
    scale = 10**6
    expect = _brandes_float(pairs, sources, max_hops=3)
    got = {
        r["id"]: r["bc_scaled"] / scale
        for r in betweenness_sampled(
            _edges(spark, pairs), _srcs(spark, sources), max_hops=3,
            scale=scale,
        ).collect()
    }
    keys = {k for k, v in expect.items() if v > 0} | {
        k for k, v in got.items() if v > 0
    }
    for k in keys:
        # floor truncation only ever rounds down, by < 1/scale per
        # term accumulated over <= n terms per level over 3 levels
        assert got.get(k, 0.0) <= expect.get(k, 0.0) + 1e-9
        assert abs(got.get(k, 0.0) - expect.get(k, 0.0)) < n * 3 / scale + 1e-6


def test_betweenness_directed_and_unreachable(spark):
    """Directed chain 1->2->3: only node 2 brokers (from source 1);
    nothing reachable from source 3 -> no rows for it."""
    from graphragpart1datapipeline_spark.graph.betweenness import (
        betweenness_sampled,
    )

    e = _edges(spark, [(1, 2), (2, 3)])
    got = {
        r["id"]: r["bc_scaled"]
        for r in betweenness_sampled(
            e, _srcs(spark, [1, 3]), max_hops=3, scale=10**6, directed=True
        ).collect()
    }
    assert got == {2: 10**6, 3: 0}


# ---------------------------------------------------------------------------
# data quality suite + skew report
# ---------------------------------------------------------------------------


def test_row_checks_one_pass_and_null_is_violation(spark):
    from graphragpart1datapipeline_spark.operators.quality import (
        row_checks_report,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (None, 1.0)],
        "k long, v double",
    )
    rep = {
        r["constraint"]: (r["n_rows"], r["violations"], r["passed"])
        for r in row_checks_report(
            df,
            [
                ("complete(k)", F.col("k").isNull()),
                ("nonneg(v)", F.col("v") < 0),  # NULL v -> violation
            ],
        ).collect()
    }
    assert rep["complete(k)"] == (4, 1, False)
    assert rep["nonneg(v)"] == (4, 2, False)  # -5 and the NULL
    with pytest.raises(ValueError, match="no checks"):
        row_checks_report(df, [])
    # the fused report is ONE aggregation pass: a single scan feeds
    # every constraint column
    plan = row_checks_report(
        df, [("a", F.col("k").isNull()), ("b", F.col("v") < 0)]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == plan.count("Union") + 1


def test_uniqueness_and_referential_reports(spark):
    from graphragpart1datapipeline_spark.operators.quality import (
        referential_report,
        uniqueness_report,
    )

    fact = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 1), (3, 2), (None, 9)],
        "a long, b long",
    )
    u = uniqueness_report(fact, ["a", "b"]).collect()[0]
    assert u["n_rows"] == 5 and u["violations"] == 1 and not u["passed"]
    dim = spark.createDataFrame([(1,), (2,)], "id long")
    r = referential_report(fact, "a", dim, "id").collect()[0]
    # orphans: the a=3 row and the NULL-key row
    assert r["n_rows"] == 5 and r["violations"] == 2 and not r["passed"]


def test_data_quality_report_composes(spark):
    from graphragpart1datapipeline_spark.operators.quality import (
        data_quality_report,
    )

    df = spark.createDataFrame([(1, "x"), (1, "x")], "k long, s string")
    dim = spark.createDataFrame([(1,)], "k long")
    rep = data_quality_report(
        df,
        row_checks=[("complete(s)", F.col("s").isNull())],
        unique_keys=[["k"]],
        references=[("k", dim, "k")],
    ).collect()
    names = {r["constraint"] for r in rep}
    assert names == {"complete(s)", "unique(k)", "fk(k -> k)"}
    by = {r["constraint"]: r["passed"] for r in rep}
    assert by["complete(s)"] and not by["unique(k)"] and by["fk(k -> k)"]
    with pytest.raises(ValueError, match="no constraints"):
        data_quality_report(df)


def test_join_skew_report_skewed_and_uniform(spark):
    from graphragpart1datapipeline_spark.operators.skew import (
        join_skew_report,
    )

    # 100 rows: key 'hot' 60x, 'warm' 30x, 10 singletons, plus 2 nulls
    rows = (
        [("hot",)] * 60 + [("warm",)] * 30
        + [(f"k{i}",) for i in range(10)] + [(None,)] * 2
    )
    df = spark.createDataFrame(rows, "k string")
    r = join_skew_report(
        df, "k", threshold_frac=0.25, target_parallelism=10, max_salt=8
    ).collect()[0]
    assert r["n_rows"] == 100 and r["n_distinct_keys"] == 12
    assert r["hot_keys"] == 2 and r["hot_rows"] == 90
    assert r["max_key_rows"] == 60 and r["max_share_ppm"] == 600000
    # ceil(60*10/100) = 6
    assert r["recommended_salt"] == 6
    uni = spark.createDataFrame(
        [(f"u{i % 50}",) for i in range(200)], "k string"
    )
    r2 = join_skew_report(uni, "k", threshold_frac=0.25).collect()[0]
    assert r2["hot_keys"] == 0 and r2["max_key_rows"] is None
    assert r2["max_share_ppm"] is None and r2["recommended_salt"] == 1
