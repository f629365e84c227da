"""SparkSession builder tuned for scale.

Single place that encodes the 100 TB design defaults (SURVEY.md §4):
AQE on (partition coalescing + skew-join split), Arrow for every
Python↔JVM exchange, shuffle partitions sized for the local harness but
overridable via env for a real cluster, broadcast threshold generous enough
that every TPC-H-ish dimension table broadcasts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sqlite_to_clickhouse_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle_partitions = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Adaptive execution: runtime partition coalescing, skew-join split,
        # broadcast demotion — the levers that keep plans healthy at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches for every pandas-UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Sized for local[32] at sf<=0.1; a real cluster overrides via env.
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        # Dimension tables (region/nation/customer/supplier/part) stay far
        # below this at any SF that fits a single node; on a cluster the
        # 100 TB fact side never broadcasts, which is what we want.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Session timezone pinned so timestamp semantics match the DuckDB
        # oracle (naive timestamps) regardless of host timezone.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    return builder.getOrCreate()
