"""Fixture-table loaders.

All driver tables are one parquet file per table under an sf dir
(TESTDATA.md). Parquet scans give Catalyst predicate pushdown, column
pruning, and (on a partitioned layout) partition pruning for free — the
callers just declare filters/projections and the scan narrows itself
(verify with ``df.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import contextlib
import fcntl
import os

from pyspark.sql import DataFrame, SparkSession


def read_marker(marker: str) -> "str | None":
    """Read a cache-validity marker, None when absent/unreadable — the
    mandatory companion to ``build_lock``'s double-checked re-check."""
    try:
        with open(marker) as fh:
            return fh.read().strip()
    except OSError:
        return None


@contextlib.contextmanager
def build_lock(path: str):
    """Exclusive cross-process lock for rebuilding a shared /tmp cache dir
    (bucketed-coloc layout, persisted ANN index).

    The rebuild pattern is rmtree + rewrite; without a lock, two sessions
    on the same sf_dir can delete the directory out from under each
    other's in-flight build.  The lockfile lives BESIDE the cache dir
    (``<path>.lock``), never inside it, so the rmtree cannot remove the
    lock itself.  Callers must RE-CHECK their cache marker after
    acquiring the lock (double-checked locking): the process that was
    queued behind the winner sees a fresh marker and skips its rebuild.
    """
    lockfile = f"{path}.lock"
    with open(lockfile, "w") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)


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


# Event-time columns per table. If the driver regenerates a fixture with a
# different physical timestamp type, these are the columns that must be
# re-normalized (everything else — int vs bigint key width, float vs double
# — drifts identically on the Spark and DuckDB sides and needs no help).
_TS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _normalize_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalize one event-time column to a session-tz TIMESTAMP regardless
    of the fixture's physical parquet type. The driver regenerates fixtures
    between rounds and has already flipped events.ts between
    TIMESTAMP(NANOS) (read as long under ``nanosAsLong``) and timestamp[us]
    (read as TIMESTAMP_NTZ), so dispatch on the *read* dtype:

    - LongType (nanos-as-long): integer ``div 1000`` then
      ``timestamp_micros`` — ns epoch values overflow double precision, so
      no float math.
    - TIMESTAMP: already what we want.
    - TIMESTAMP_NTZ / anything else: plain cast. Under the pinned UTC
      session timezone this preserves the wall-clock value DuckDB sees,
      keeping oracle hash parity.

    Exception: a column that reads as TIMESTAMP_NTZ today (o_orderdate,
    l_shipdate) is left NTZ — every oracle was validated against that, and
    NTZ vs UTC-timestamp hash identically only for columns the driver
    serializes as naive. Normalization kicks in only on a long read, the
    one shape Spark can't use directly.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000"))
        )
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """events.ts: long → micros conversion as in ``_normalize_ts``, plus a
    TIMESTAMP_NTZ → TIMESTAMP cast (the batch ops and streaming watermarks
    were built and driver-validated against TimestampType)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    df = _normalize_ts(df, "ts")
    if not isinstance(df.schema["ts"].dataType, TimestampType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


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
    else:
        for col in _TS_COLUMNS.get(name, ()):
            df = _normalize_ts(df, col)
    return df
