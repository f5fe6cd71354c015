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
