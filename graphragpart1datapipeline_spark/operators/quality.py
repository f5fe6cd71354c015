"""Declarative data-quality constraint suite — the Deequ /
Great-Expectations staple for 100 TB ingest gates, compiled to the
MINIMUM number of passes: every row-local constraint (completeness,
range, accepted values, regex, custom predicate) becomes one column of
ONE aggregation over ONE scan; set-level constraints (uniqueness,
referential integrity) each add exactly one aggregate/anti-join. The
output is a long-format report (constraint, metric, violations,
passed) a pipeline can alert on.

Design: constraints are declared as (name, Column-predicate) pairs —
predicate TRUE means the row violates. ``data_quality_report`` turns
each into SUM(CAST(violation AS BIGINT)) inside a single groupBy().agg
— Catalyst evaluates all predicates in one whole-stage-codegen pass
over the scan, so adding a 20th check costs one more column, not one
more job. Uniqueness runs as count - count_distinct on the key struct
(one extra aggregate in the same pass when exact=False is acceptable;
exact duplicate COUNT needs its own groupBy). Referential integrity is
a broadcast-able anti-join count against the dimension's key column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_checks_report(
    df: DataFrame,
    checks: Sequence[tuple[str, Column]],
) -> DataFrame:
    """One-pass report for row-local constraints. ``checks`` is a list
    of (constraint_name, violation_predicate). Returns (constraint,
    n_rows, violations, passed) — one row per constraint."""
    if not checks:
        raise ValueError("row_checks_report: no checks declared")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(checks):
        # coalesce the SUM itself: over a zero-row input SUM is NULL,
        # which would make passed = (NULL == 0) = NULL — an ingest gate
        # checking passed==true vs ==false would see neither. Empty
        # input reports violations=0, passed=true (pair with an
        # explicit n_rows>0 check when emptiness itself is a failure).
        aggs.append(
            F.coalesce(
                F.sum(F.coalesce(pred, F.lit(True)).cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias(f"__v{i}")
        )
    wide = df.groupBy().agg(*aggs)
    reports = []
    for i, (name, _) in enumerate(checks):
        reports.append(
            wide.select(
                F.lit(name).alias("constraint"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v{i}").alias("violations"),
                (F.col(f"__v{i}") == 0).alias("passed"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def uniqueness_report(
    df: DataFrame, key_cols: Sequence[str], constraint: str | None = None
) -> DataFrame:
    """Exact duplicate-ROW count for a key: total rows minus distinct
    keys (one groupBy). NULL keys count as a key value (they must be
    caught by a completeness check, not silently dropped — hence the
    struct wrap, which makes count_distinct null-safe)."""
    name = constraint or ("unique(" + ",".join(key_cols) + ")")
    k = F.struct(*[F.col(c) for c in key_cols])
    rep = df.select(k.alias("__k")).groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("__k")).alias("__d"),
    )
    return rep.select(
        F.lit(name).alias("constraint"),
        "n_rows",
        (F.col("n_rows") - F.col("__d")).alias("violations"),
        (F.col("n_rows") == F.col("__d")).alias("passed"),
    )


def referential_report(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    constraint: str | None = None,
) -> DataFrame:
    """Orphaned-foreign-key count: fact rows whose key has no match in
    the dimension (left-anti join; Catalyst broadcasts a small dim).
    NULL fact keys are orphans too (they never join) — catch/allow
    them with an explicit completeness check."""
    name = constraint or f"fk({fact_key} -> {dim_key})"
    total = fact.groupBy().agg(F.count(F.lit(1)).alias("n_rows"))
    orphans = (
        fact.select(F.col(fact_key))
        .join(
            dim.select(F.col(dim_key).alias(fact_key)).distinct(),
            fact_key,
            "left_anti",
        )
        .groupBy()
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return (
        total.crossJoin(F.broadcast(orphans))
        .select(
            F.lit(name).alias("constraint"),
            "n_rows",
            "violations",
            (F.col("violations") == 0).alias("passed"),
        )
    )


def data_quality_report(
    df: DataFrame,
    row_checks: Sequence[tuple[str, Column]] = (),
    unique_keys: Sequence[Sequence[str]] = (),
    references: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Full suite: row-local checks fused into one scan pass, plus one
    aggregate per uniqueness key and one anti-join per reference.
    Returns the concatenated (constraint, n_rows, violations, passed)
    report."""
    parts = []
    if row_checks:
        parts.append(row_checks_report(df, row_checks))
    for keys in unique_keys:
        parts.append(uniqueness_report(df, list(keys)))
    for fact_key, dim, dim_key in references:
        parts.append(referential_report(df, fact_key, dim, dim_key))
    if not parts:
        raise ValueError("data_quality_report: no constraints declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
