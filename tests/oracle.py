"""Local replica of the driver's DuckDB-oracle correctness gate:
run a Spark query and its oracle SQL on the same parquet tables, then
compare row count, column names, and values (order-insensitive)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def compare(spark_df, sql: str, con: duckdb.DuckDBPyConnection) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    issues: list[str] = []
    sp = _normalize(spark_df.toPandas())
    du = _normalize(con.execute(sql).df())
    if list(sp.columns) != list(du.columns):
        issues.append(f"columns: spark={list(sp.columns)} duck={list(du.columns)}")
        return issues
    if len(sp) != len(du):
        issues.append(f"rowcount: spark={len(sp)} duck={len(du)}")
        return issues
    for c in sp.columns:
        a, b = sp[c], du[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            aa = a.astype(float).to_numpy()
            bb = b.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(aa, bb)):
                both_nan = (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                )
                if not both_nan and x != y:
                    issues.append(f"col {c} row {i}: spark={x!r} duck={y!r}")
                    break
        else:
            neq = ~(
                (a.astype(object) == b.astype(object))
                | (a.isna() & b.isna())
            )
            if neq.any():
                i = int(neq.idxmax())
                issues.append(f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r}")
    return issues
