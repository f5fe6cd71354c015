"""Retrieval evaluation metrics — MRR, nDCG@k (Järvelin & Kekäläinen
2002), recall@k, and AP@k / MAP over a run table: the standard
trec_eval readout set (the engine's q160/q186/q233 recall GATES
remain the pass/fail thresholds; this is the reporting surface). Feed it any ranking the engine
produces (multi_query_topk, ivf/pq/bm25/RRF serving DAGs) plus a
qrels table, get per-query and corpus-level quality.

Scale shape: the run is (queries × k) rows — serving-sized, never
corpus-sized; qrels join on (query, doc); the ideal ranking is one
window over qrels partitioned by query (rank ≤ k cut). Everything is
JVM-side column work, one query-keyed aggregation each.

Determinism / oracle parity (q246): every division-by-log is rounded
ONCE to a scaled long — the per-rank discount ``w(r) =
round(scale / log2(r+1))`` — after which DCG/IDCG are exact integer
sums of ``gain · w`` (gain = 2^rel − 1, exact via shiftleft); the
reciprocal rank is ``round(scale / r)``. The final nDCG is one
integer-over-integer double division. log2's final-ulp wobble across
engines is absorbed by the rounding cell (the q230 rule)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["retrieval_metrics", "mean_retrieval_metrics"]

_MAX_REL = 30  # gains are 2^rel − 1 in a long; beyond this is a bug


def _discount(rank: Column, scale: int) -> Column:
    """round(scale / log2(rank+1)) as a long — the ONE rounding of the
    log; rank 1 discounts to exactly ``scale`` (log2(2) = 1)."""
    return F.floor(
        F.lit(float(scale)) / F.log2(rank.cast("double") + 1.0)
        + F.lit(0.5)
    ).cast("long")


def _gain(rel: Column) -> Column:
    """2^rel − 1 as an exact long (shiftleft, never pow doubles;
    call_function because the Python shiftleft wrapper only takes a
    literal bit count)."""
    return (
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), rel.cast("int")
        )
        - 1
    ).cast("long")


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    q_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-query metrics: (q_col, rr, dcg_s, idcg_s, ndcg, rel_ret,
    rel_tot, recall, ap_s, ap) — the full TREC readout set.

    - ``rr``      reciprocal rank of the first rel>0 result, scaled:
                  ``round(scale / rank)`` (0 when nothing relevant was
                  retrieved within the run).
    - ``dcg_s``   Σ over retrieved ranks ≤ k of gain·discount (exact
                  long; unjudged docs count rel 0).
    - ``idcg_s``  the same sum over the IDEAL ordering of the query's
                  qrels (rel desc, id asc — ties carry equal rel, so
                  the tiebreak never changes the value), top k.
    - ``ndcg``    dcg_s / idcg_s as one double division (0.0 when the
                  query has no relevant docs at all).
    - ``rel_ret`` relevant docs retrieved within k (exact count).
    - ``rel_tot`` the query's total relevant docs in qrels (exact).
    - ``recall``  recall@k = rel_ret / rel_tot, one double division
                  (0.0 when the query has no relevant docs).
    - ``ap_s``    Σ over retrieved relevant ranks r ≤ k of the scaled
                  precision ``round(scale · hits@r / r)`` — each
                  rational P@r rounds ONCE to a long, then sums
                  exactly.
    - ``ap``      average precision @k: ap_s / (scale · rel_tot) as
                  one double division (the trec_eval convention —
                  denominator is the TOTAL relevant count, so
                  truncation at k is penalized; 0.0 when rel_tot=0).
                  MAP is :func:`mean_retrieval_metrics`'s mean of
                  these.

    EVERY query mentioned in ``run`` or ``qrels`` gets a row — a
    query whose serving DAG returned nothing (or nothing within k)
    scores rr=0 / ndcg=0 (the TREC convention), so the
    :func:`mean_retrieval_metrics` rollup is never inflated by
    dropping exactly the queries where retrieval failed hardest.
    Ranks must be 1-based: a NULL rank or rank < 1 RAISES (a 0-based
    rank would make the log2 discount divide by zero and silently wrap
    to garbage; a NULL one would be silently dropped by the ``<= k``
    filter — both are malformed run tables, so both fail loudly)."""
    if k < 1:
        raise ValueError(f"retrieval_metrics: k must be >= 1, got {k}")
    rank_guarded = F.when(
        F.col("__rank").isNull() | (F.col("__rank") < 1),
        F.raise_error(
            F.concat(
                F.lit(
                    "retrieval_metrics: ranks must be 1-based "
                    "(>= 1); got "
                ),
                F.coalesce(F.col("__rank").cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(F.col("__rank").cast("long"))
    r = (
        run.select(
            F.col(q_col), F.col(id_col), F.col(rank_col).alias("__rank")
        )
        .select(q_col, id_col, rank_guarded.alias("__rank"))
        .filter(F.col("__rank") <= k)
    )
    universe = (
        run.select(q_col)
        .unionByName(qrels.select(q_col))
        .distinct()
    )
    # the overflow guard rides inside the rel column itself — every
    # downstream aggregate (DCG and IDCG alike) consumes it, so it
    # cannot be pruned away
    relg = F.when(
        F.col("__rel") > _MAX_REL,
        F.raise_error(
            F.concat(
                F.lit(
                    f"retrieval_metrics: rel exceeds {_MAX_REL} "
                    "(gain 2^rel-1 would overflow a long); got "
                ),
                F.col("__rel").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("__rel").cast("long"))
    qr = (
        qrels.select(
            F.col(q_col), F.col(id_col), F.col(rel_col).alias("__rel")
        )
        .filter(F.col("__rel") > 0)
        .select(q_col, id_col, relg.alias("__rel"))
    )
    joined = r.join(qr, [q_col, id_col], "left").select(
        q_col, "__rank", F.coalesce("__rel", F.lit(0)).alias("__rel")
    )
    # cumulative relevant-hits at each rank — the P@r numerator (ranks
    # are unique per query in any row_number-built run, so the window
    # frame is deterministic)
    wcum = Window.partitionBy(q_col).orderBy(F.asc("__rank"))
    with_hits = joined.withColumn(
        "__hits",
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0)).over(wcum),
    )
    ap_term = F.when(
        F.col("__rel") > 0,
        F.floor(
            F.lit(float(scale)) * F.col("__hits") / F.col("__rank")
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    per_q = with_hits.groupBy(q_col).agg(
        F.coalesce(
            F.floor(
                F.lit(float(scale))
                / F.min(
                    F.when(F.col("__rel") > 0, F.col("__rank"))
                ).cast("double")
                + F.lit(0.5)
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("rr"),
        F.sum(
            _gain(F.col("__rel")) * _discount(F.col("__rank"), scale)
        ).alias("dcg_s"),
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("rel_ret"),
        F.sum(ap_term).alias("ap_s"),
    )
    rel_tot = qr.groupBy(q_col).agg(
        F.count(F.lit(1)).cast("long").alias("rel_tot")
    )
    w = Window.partitionBy(q_col).orderBy(
        F.desc("__rel"), F.asc(id_col)
    )
    ideal = (
        qr.withColumn("__pos", F.row_number().over(w))
        .filter(F.col("__pos") <= k)
        .groupBy(q_col)
        .agg(
            F.sum(
                _gain(F.col("__rel")) * _discount(F.col("__pos"), scale)
            ).alias("idcg_s")
        )
    )
    out = (
        universe.join(per_q, q_col, "left")
        .join(ideal, q_col, "left")
        .join(rel_tot, q_col, "left")
        .select(
            q_col,
            F.coalesce("rr", F.lit(0)).cast("long").alias("rr"),
            F.coalesce("dcg_s", F.lit(0)).cast("long").alias("dcg_s"),
            F.coalesce("idcg_s", F.lit(0)).cast("long").alias("idcg_s"),
            F.coalesce("rel_ret", F.lit(0)).cast("long").alias("rel_ret"),
            F.coalesce("rel_tot", F.lit(0)).cast("long").alias("rel_tot"),
            F.coalesce("ap_s", F.lit(0)).cast("long").alias("ap_s"),
        )
        .withColumn(
            "ndcg",
            F.when(
                F.col("idcg_s") > 0,
                F.col("dcg_s").cast("double") / F.col("idcg_s"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "recall",
            F.when(
                F.col("rel_tot") > 0,
                F.col("rel_ret").cast("double") / F.col("rel_tot"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "ap",
            F.when(
                F.col("rel_tot") > 0,
                F.col("ap_s").cast("double")
                / (F.col("rel_tot") * F.lit(float(scale))),
            ).otherwise(F.lit(0.0)),
        )
        .select(
            q_col, "rr", "dcg_s", "idcg_s", "ndcg",
            "rel_ret", "rel_tot", "recall", "ap_s", "ap",
        )
    )
    return out


def mean_retrieval_metrics(
    per_query: DataFrame,
    q_col: str = "query_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """One-row corpus rollup of :func:`retrieval_metrics`: (n_queries,
    mrr, mean_ndcg, mean_recall, map). MRR sums the exact scaled
    reciprocal ranks and divides once; mean nDCG / recall / MAP
    decimal-accumulate the per-query doubles (order-independent) and
    divide once each."""

    def _dmean(col: str):
        return (
            F.sum(F.col(col).cast("decimal(25,15)")).cast("double")
            / F.count(F.lit(1))
        )

    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (
            F.sum("rr").cast("double")
            / (F.count(F.lit(1)) * F.lit(float(scale)))
        ).alias("mrr"),
        _dmean("ndcg").alias("mean_ndcg"),
        _dmean("recall").alias("mean_recall"),
        _dmean("ap").alias("map"),
    )
