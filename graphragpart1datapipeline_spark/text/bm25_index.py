"""Incremental BM25 inverted index: build once, upsert increments,
query without ever re-tokenizing the corpus.

:func:`bm25_topk` (analysis.py) re-derives postings, document lengths
and document frequencies from the raw text on EVERY call — right for a
one-off query, wrong for a serving tier or a daily-crawl corpus where
documents arrive in increments. This module is the retrieval twin of
``dedup/incremental.py``'s persisted-index pattern (round-4 verdict
task 5): the index is a dict of plain DataFrames (persist them as
parquet — postings partitioned/bucketed by ``term`` so a query's
term filter prunes at scan time), and the structural contract makes
corpus re-work impossible: :func:`bm25_upsert` and :func:`bm25_query`
never receive the corpus documents at all, only the index tables.

Index tables:
  ``postings`` (rid, term, tf)  — full inverted index, term-prunable
  ``dl``       (rid, dl)        — document lengths
  ``dfreq``    (term, df)       — per-term document frequencies
  ``params``   1-row            — tokenizer version stamp (the postings
                                  are only consistent for one scheme)

Upsert semantics are true UPSERT: an incoming rid replaces its old
rows (the delete side is an anti-join against the increment-sized,
broadcastable rid set), and ``dfreq`` is updated for TOUCHED TERMS
ONLY (±1 delta rows unioned onto the old table and re-summed per term
— vocabulary-sized work, never a full postings regroup; expressed as
union + groupBy rather than an outer join so a serving-side term
filter pushes through to every branch).

Exactness: :func:`bm25_query` reproduces :func:`bm25_topk`'s IEEE op
sequence term by term (same rational idf, same decimal-accumulated
per-doc sum), so index-then-query equals rebuild bit-for-bit — q179
locks split-apply == one-shot against the same DuckDB oracle that
already proves q103.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens

# bump if the tokenizer scheme ever changes — a persisted index built
# under another scheme must refuse to compose with this code
_TOKENIZER_VERSION = 1

__all__ = ["bm25_index", "bm25_upsert", "bm25_delete", "bm25_query"]


def _index_parts(df: DataFrame, text_col: str, id_col: str):
    toks = df.select(
        F.col(id_col).alias("rid"), tokens(text_col).alias("__toks")
    )
    dl = toks.select("rid", F.size("__toks").alias("dl"))
    tf = (
        toks.select("rid", F.explode("__toks").alias("__t"))
        .select("rid", F.lower("__t").alias("term"))
        .groupBy("rid", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return dl, tf


def bm25_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict[str, DataFrame]:
    """Build the index from a corpus snapshot: ONE tokenize pass, one
    (rid, term) shuffle for tf, one term-sized groupBy for df. Persist
    the tables (postings partitioned/bucketed by term) and hand the
    dict to :func:`bm25_upsert` / :func:`bm25_query`."""
    dl, tf = _index_parts(df, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    params = df.sparkSession.createDataFrame(
        [(_TOKENIZER_VERSION,)], "tokenizer_version long"
    )
    return {"postings": tf, "dl": dl, "dfreq": dfreq, "params": params}


def _check_version(index: dict[str, DataFrame], fn: str) -> None:
    tbl = index.get("params")
    if tbl is None:
        return
    ver = tbl.limit(1).collect()[0][0]
    if ver != _TOKENIZER_VERSION:
        raise ValueError(
            f"{fn}: index was built with tokenizer_version={ver}, this "
            f"code is version={_TOKENIZER_VERSION} — rebuild the index "
            "(mixed tokenization makes postings inconsistent)"
        )


def bm25_upsert(
    index: dict[str, DataFrame],
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Fold an increment into the index. Tokenizes ONLY ``new_df``;
    the corpus side is touched as (a) one broadcast anti/semi-join of
    postings+dl against the increment-sized rid set (the replace rule)
    and (b) a touched-term-sized join updating ``dfreq`` — never a
    corpus re-scan of text, never a full postings regroup. Increments
    compose: upsert(upsert(ix, a), b) == upsert(ix, a∪b) for disjoint
    rid sets (q179 locks the equality against the full rebuild)."""
    _check_version(index, "bm25_upsert")
    dl_n, tf_n = _index_parts(new_df, text_col, id_col)
    new_ids = dl_n.select("rid").distinct()
    removed = index["postings"].join(F.broadcast(new_ids), "rid")
    kept = index["postings"].join(F.broadcast(new_ids), "rid", "left_anti")
    postings = kept.unionByName(tf_n)
    dl = (
        index["dl"]
        .join(F.broadcast(new_ids), "rid", "left_anti")
        .unionByName(dl_n)
    )
    # touched terms only: +1 per term per added doc, -1 per removed.
    # Round-11 (guide §2.4): the delta used to fold in via a FULL OUTER
    # join + coalesce-add — semantically a per-term sum, but a shape
    # Catalyst cannot push a downstream term filter through (predicates
    # on the coalesced key of a full outer join are not pushable), so
    # bm25_query's `term isin (qterms)` stopped at the join and every
    # corpus-postings branch below it ran UNFILTERED (the 66-Exchange
    # q179 plan). The same sum expressed as union + groupBy is
    # bit-identical (exact integer adds in any grouping) and fully
    # transparent to pushdown: the query's term filter now reaches
    # just-above-the-explode on every branch, so the (rid, term)
    # shuffles carry query-term rows only. One exchange instead of
    # three (delta groupBy + two full-outer SMJ exchanges).
    dfreq = (
        index["dfreq"]
        .select("term", F.col("df").cast("long").alias("__d"))
        .unionByName(tf_n.select("term", F.lit(1).cast("long").alias("__d")))
        .unionByName(
            removed.select("term", F.lit(-1).cast("long").alias("__d"))
        )
        .groupBy("term")
        .agg(F.sum("__d").alias("df"))
        .filter(F.col("df") > 0)
    )
    return {
        "postings": postings,
        "dl": dl,
        "dfreq": dfreq,
        "params": index["params"],
    }


def bm25_delete(
    index: dict[str, DataFrame],
    ids: DataFrame,
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Remove documents from the index — the maintenance operation a
    real corpus needs for takedowns/expiry that :func:`bm25_upsert`
    (replace-or-insert) cannot express. ``ids`` is an increment-sized
    frame whose FIRST column (or ``id_col`` if present) holds the rids
    to drop. Work is deletion-sized: postings/dl rows leave via one
    broadcast anti-join each, and ``dfreq`` decrements for the REMOVED
    DOCS' TERMS ONLY (terms reaching df 0 disappear) — never a corpus
    re-scan, never a postings regroup. delete(index(c), d) ==
    index(c − d) exactly (q215 locks it against the one-shot oracle);
    ids absent from the index are no-ops."""
    _check_version(index, "bm25_delete")
    col = id_col if id_col in ids.columns else ids.columns[0]
    rid = ids.select(F.col(col).alias("rid")).distinct()
    removed = index["postings"].join(F.broadcast(rid), "rid")
    postings = index["postings"].join(F.broadcast(rid), "rid", "left_anti")
    dl = index["dl"].join(F.broadcast(rid), "rid", "left_anti")
    # union + groupBy instead of left-join-minus (round-11, same
    # pushdown rationale as bm25_upsert's dfreq): bit-identical — terms
    # only in `removed` sum negative and are dropped by the df > 0
    # filter exactly as the left join dropped them, and a downstream
    # term filter pushes through both branches
    dfreq = (
        index["dfreq"]
        .select("term", F.col("df").cast("long").alias("__d"))
        .unionByName(
            removed.select("term", F.lit(-1).cast("long").alias("__d"))
        )
        .groupBy("term")
        .agg(F.sum("__d").alias("df"))
        .filter(F.col("df") > 0)
    )
    return {
        "postings": postings,
        "dl": dl,
        "dfreq": dfreq,
        "params": index["params"],
    }


def bm25_query(
    index: dict[str, DataFrame],
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    log_idf: bool = True,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k served FROM THE INDEX: postings filtered to the query
    terms (partition-prunable at rest), dfreq filtered term-sized and
    broadcast, corpus stats one map-side agg over ``dl`` — the raw text
    never in the plan. Output schema and every IEEE op match
    :func:`bm25_topk` exactly (same rational idf, same
    decimal-accumulated per-doc sum, same (score desc, id) tie-break),
    so serving from the index is bit-identical to the one-shot path."""
    from pyspark.sql import Window

    if not terms:
        # zero-arg Column.isin() is an analysis error downstream —
        # fail loudly up front, matching the module's guard convention
        raise ValueError("bm25_query: terms is empty")
    _check_version(index, "bm25_query")
    qterms = sorted({t.lower() for t in terms})
    stats = index["dl"].agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = index["postings"].filter(F.col("term").isin(*qterms))
    dfreq = index["dfreq"].filter(F.col("term").isin(*qterms))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(index["dl"], "rid")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    rational = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    idf = F.log(F.lit(1.0) + rational) if log_idf else rational
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl") / avgdl)
    )
    term_score = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    per_doc = (
        scored.withColumn("__s", term_score)
        .groupBy("rid")
        .agg(
            F.sum(F.col("__s").cast("decimal(38,12)"))
            .cast("double")
            .alias("score"),
            F.count(F.lit(1)).alias("matched_terms"),
        )
        .withColumnRenamed("rid", id_col)
    )
    topk = per_doc.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))
