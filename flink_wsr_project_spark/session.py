"""SparkSession factory.

Tuned for single-JVM local[N] testing but configured the way a real
cluster deployment would be: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), UTC session timezone (required for
bit-exact comparison against the DuckDB oracle, whose timestamps are
UTC-naive), Arrow enabled for the Pandas-UDF slow path.

At 100 TB scale the same settings hold; only ``shuffle.partitions``
(here ~cores) would be sized to executors × cores, and AQE's
``advisoryPartitionSizeInBytes`` governs post-shuffle sizing anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "flink_wsr_project_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the session.

    ``local[N]`` with N = $SPARK_GRAFT_CPUS by default; shuffle
    partitions default to N (not Spark's 200 — wrong for both tiny
    local runs and, with AQE coalescing, harmless to keep low here).
    """
    cpus = str(cpus or _DEFAULT_CPUS)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions by TARGET SIZE, not up to the
        # initial parallelism (the Spark-docs-recommended setting): tiny
        # stages collapse to a handful of tasks instead of 32 near-empty
        # ones. Scale-safe: AQE only MERGES partitions — the initial
        # shuffle.partitions still governs scale-out, and at 100 TB
        # partitions exceed the advisory size so coalescing is a no-op.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # Advisory sizing rule: ~(post-shuffle bytes / total cores), so
        # every core gets work. The local harness shuffles tens of MB on
        # 32 threads → 2m (measured: 8m coalesced the heavy agg stages to
        # 1-2 tasks and cost ~25% of steady-state bench time). A cluster
        # deployment at TB shuffle volumes sets 64m (Spark's default) via
        # $SPARK_GRAFT_ADVISORY_PARTITION — the rule, not the constant,
        # is what scales.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "2m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # builder-phase twin of operators.windows.pin_session_utc (the
        # runtime pin applied by load_table/ensure_event_time for
        # externally-built sessions) — keep the two in sync
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
