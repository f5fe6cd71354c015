"""SQL surface: every test table as a temp view, so the whole engine
is drivable from ``spark.sql`` — Catalyst plans SQL and DataFrame calls
identically (same optimizer, same physical strategies), which q148
proves by hashing a pure-SQL pipeline against the DuckDB oracle.

At 100 TB these views become catalog tables (Unity/Hive/Glue) and the
same SQL runs unchanged; the DataFrame operators in this package and
ad-hoc SQL compose freely via ``df.createOrReplaceTempView`` /
``spark.table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every test-data table as a temp view named
    ``{prefix}{table}``; returns the view names. Reads go through
    ``sources.read_table`` so the nanos-timestamp fallback and
    multi-path handling apply to SQL users too."""
    from .sources import read_table

    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        read_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin alias so pipelines can mix SQL stages with operator stages
    without importing SparkSession plumbing."""
    return spark.sql(query)
