"""Fixture-table loaders.

All driver tables are one parquet file per table under an sf dir
(TESTDATA.md). Parquet scans give Catalyst predicate pushdown, column
pruning, and (on a partitioned layout) partition pruning for free — the
callers just declare filters/projections and the scan narrows itself
(verify with ``df.explain``: ``PushedFilters`` / ``ReadSchema``).
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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-tz TIMESTAMP regardless of the
    fixture's physical parquet type. The driver regenerates fixtures between
    rounds and has already flipped between TIMESTAMP(NANOS) (read as long
    under ``nanosAsLong``) and timestamp[us] (read as TIMESTAMP_NTZ), so
    dispatch on the *read* dtype instead of assuming one:

    - LongType (nanos-as-long): integer ``div 1000`` then
      ``timestamp_micros`` — ns epoch values overflow double precision, so
      no float math.
    - TIMESTAMP_NTZ / anything else: plain cast. Under the pinned UTC
      session timezone this preserves the wall-clock value DuckDB sees,
      keeping oracle hash parity.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampType):
        return df
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (reference R3's engine analog)."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    # Timestamps must mean the same instant the DuckDB oracle sees (naive);
    # pin the session timezone in case the caller's session didn't.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Tolerate TIMESTAMP(NANOS) fixtures (Spark refuses them by default with
    # PARQUET_TYPE_ILLEGAL); harmless when the fixture is already micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df
