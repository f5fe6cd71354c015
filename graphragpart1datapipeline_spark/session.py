"""SparkSession factory tuned for the engine.

Design notes (100 TB posture)
-----------------------------
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and broadcast-join demotion/promotion replace hand-tuned plans.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster this is the *initial* number only — AQE coalesces.
- Arrow enabled for every pandas interchange (mapInPandas / pandas_udf):
  the reference's Polars kernels become Arrow-batched exchanges here.
- Session timezone pinned to UTC so event-time semantics are stable and
  oracle (DuckDB) comparisons on timestamps are exact.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP = "graphragpart1datapipeline-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = DEFAULT_APP,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default tuning."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Round-10 measured DECISION (guide §1): keep AQE's default
        # parallelismFirst=true. An interleaved same-session A/B over
        # the whole headline (per-query A/B/A/B reps, /tmp/ab_pfirst)
        # read 102.9s (true) vs 120.7s (false@64m advisory): honoring
        # the advisory SIZE serializes the CPU-dense small-byte stages
        # (q105 pair explosion 4.9→12.5s, q178 10.3 vs 3.7s) for only
        # a ~0.5s win on the iterative graph loops. Partition sizing
        # stays scale-adaptive through AQE either way; the advisory
        # size remains env-tunable for cluster runs where bytes/task
        # should dominate (guide §2.2 recommends 100MB-1GB there).
        # NOTE: the "64m" local default IS Spark's own default — the
        # config line documents the measured decision and the env
        # knob; it is not itself a tuning change.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # the engine registers ~250 queries; a long session JIT-compiles
        # thousands of codegen'd stages, and the JVM default code cache
        # (240 MB) can fill — at which point the JIT silently disables
        # and every later plan runs interpreted (late-bench queries
        # slow down round-over-round as coverage grows). 512 MB keeps
        # compilation alive for the whole run.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
