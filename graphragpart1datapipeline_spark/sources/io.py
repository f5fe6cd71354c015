"""Parquet / JSONL sources and sinks.

Reference: Polars I/O managers with streaming sinks, atomic tmp-rename
commit, and multi-partition scans (io_managers.py:84-232). In Spark all
three properties are native: the Parquet committer is atomic, scans
accept path lists/globs, and writes stream through the task commit
protocol. The one semantic worth porting explicitly is the *sparse*
JSONL writer (None keys omitted per row — io_managers.py:165-183),
which Spark's json writer does by default (ignoreNullFields=true).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_parquet(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType | None = None,
) -> DataFrame:
    """Schema-enforced Parquet scan; accepts one path or a partition
    list (reference S2, io_managers.py:122-140)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(paths, str):
        return reader.parquet(paths)
    return reader.parquet(*paths)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Atomic overwrite Parquet sink (reference S1)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """JSONL scan; pass a schema in engine code (reference S4 infers —
    io_managers.py:229-232 — but the engine proper always declares)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl_sparse(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Sparse JSONL sink: one JSON object per row, null fields omitted
    (reference S3, io_managers.py:165-183). ignoreNullFields is Spark's
    default, stated explicitly because it IS the contract."""
    df.write.mode(mode).option("ignoreNullFields", "true").json(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    path: str | None = None,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed Parquet table for co-located joins — THE 100 TB join
    strategy: two tables bucketed (and optionally sorted) on the same
    keys with the same bucket count join with NO Exchange (and no Sort,
    if sorted) — the shuffle is paid once at write time and amortized
    over every subsequent join/aggregation on those keys. Verified by a
    plan-shape test (tests/test_plans.py).

    Bucketing requires the table catalog, hence saveAsTable; pass
    ``path`` to make it an external table at that location."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


_SMALL_FILE_BYTES = 256 << 10


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver synthetic table.

    Two robustness/scale adaptations:
    - TIMESTAMP(NANOS) parquet (the events table) is rejected by Spark's
      vectorized reader: fall back to the nanos-as-long legacy conf and
      truncate to micros — exactly DuckDB's ns→us coercion, so oracle
      comparisons agree.
    - The driver's tables are single-file/single-row-group parquet, so a
      scan is ONE task no matter what maxPartitionBytes says. For the
      CPU-heavy text/vector tables (documents, embeddings) repartition
      to cluster parallelism — per-row hashing/shingling work dwarfs the
      tiny shuffle. Relational tables stay as-is: their heavy lifting
      happens after an agg/join shuffle anyway, and measurements show
      the extra exchange costs more than the single-task scan. On real
      multi-file datasets ensure_parallelism is a no-op.
    """
    import os as _os

    from pyspark.sql import functions as F

    from ..util import ensure_parallelism

    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception:  # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if name in ("documents", "embeddings"):
        # NOTE: measured at sf0.1 — .cache() here is a LOSS (in-memory
        # columnar scan + broken codegen fusion cost more than re-reading
        # a small parquet the page cache already holds); repartition only.
        try:
            size = _os.path.getsize(path)
        except OSError:
            size = 0
        if size > _SMALL_FILE_BYTES:
            df = ensure_parallelism(df)
    return df


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """Schema-REQUIRED CSV scan. Inference is deliberately not offered:
    at 100 TB `inferSchema` is a full extra pass over the data before
    the real one, and the inferred types drift between samples —
    declare the schema and the scan is single-pass with column pruning
    intact."""
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if isinstance(paths, str):
        return reader.csv(paths)
    return reader.csv(list(paths))


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_orc(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType | str | None = None,
) -> DataFrame:
    """ORC scan (same pushdown/pruning properties as Parquet)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(paths, str):
        return reader.orc(paths)
    return reader.orc(*paths)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table with ``ts`` normalized to a
    TIMESTAMP column.

    The driver has shipped this table in two physical forms across
    rounds: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    admits as ``long`` under the legacy nanosAsLong conf) and plain
    TIMESTAMP(MICROS). FileStreamSource needs an explicit schema, so
    probe the batch footer first and adapt both the stream schema and
    the ts conversion — downstream windowing code sees ``ts timestamp``
    either way. The ``events.*`` glob keeps basePath = the directory
    (FileStreamSource rejects a bare file as basePath).
    """
    path = f"{sf_dir}/events.parquet"
    try:
        batch = spark.read.parquet(path)
    except Exception:  # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        batch = spark.read.parquet(path)
    sdf = spark.readStream.schema(batch.schema).parquet(f"{sf_dir}/events.*")
    ts_type = dict(batch.dtypes).get("ts")
    if ts_type == "bigint":
        # nanos-as-long: truncate to micros, matching DuckDB's ns→us read
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (LTZ). The cast interprets the
        # naive value in the session timezone; it must be UTC or window
        # boundaries and downstream ntz round-trips become tz-dependent.
        # session.py pins UTC at build time, so this is normally a
        # no-op — but if the caller built a non-UTC session, flipping
        # the conf here would silently change timestamp rendering for
        # every later query, so mutate LOUDLY.
        tz = spark.conf.get("spark.sql.session.timeZone", "")
        if tz != "UTC":
            import warnings

            warnings.warn(
                "read_events_stream: session timeZone was "
                f"{tz!r}; setting it to UTC session-wide (ntz events "
                "require UTC interpretation). Build the session with "
                "spark.sql.session.timeZone=UTC to avoid this mutation.",
                stacklevel=2,
            )
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def read_testdata(
    spark: SparkSession, sf_dir: str, tables: Sequence[str] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's synthetic tables from an sf directory."""
    return {t: read_table(spark, sf_dir, t) for t in tables}


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: Sequence[str] | None = None,
) -> int:
    """Small-files compaction with optional range clustering — the
    maintenance pass a 100 TB table needs after streaming/incremental
    ingest (thousands of tiny files destroy scan parallelism math and
    NameNode/listing budgets).

    File count = ceil(input bytes / target_file_bytes), measured from
    the source files themselves (not row counts — compression ratio is
    preserved approximately). With ``cluster_by``, rows are
    range-partitioned and sorted within files on those keys, so the
    parquet min/max footer stats become selective and point/range
    predicates skip whole files — the practical 80% of Z-ordering for
    single-key access patterns. Returns the target file count.
    """
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(in_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(in_path)
    if cluster_by:
        cols = [F.col(c) for c in cluster_by]
        df = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(out_path)
    return n_files
