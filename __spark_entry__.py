"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``sqlite_to_clickhouse_spark``; this module is the
thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Pin the PROCESS timezone to UTC before any Spark session exists.
# PySpark's non-Arrow collect() renders TimestampType through
# datetime.fromtimestamp — the HOST zone, not the session zone — so on a
# non-UTC host every collected timestamp would shift against the DuckDB
# oracle's naive-UTC values even with spark.sql.session.timeZone=UTC
# (verified by driving the time-op battery under TZ=America/New_York:
# 9 hash mismatches without this pin, 0 with it). No-op on a UTC host.
os.environ["TZ"] = "UTC"
if hasattr(time, "tzset"):  # POSIX; harmless guard elsewhere
    time.tzset()

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from sqlite_to_clickhouse_spark import registry as _registry  # noqa: E402


def _utc_pinned(fn: Callable[[SparkSession, str], DataFrame]):
    """Set the SESSION timezone to UTC on the caller-provided session
    (the driver owns the SparkSession; session tz is runtime-settable)
    so JVM-side date semantics match the oracle regardless of the
    driver's own builder config."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return wrapped

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return _utc_pinned(_registry.queries()["pricing_summary"])(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2b."""
    return {name: _utc_pinned(fn) for name, fn in _registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; ⊘ (non-SQL-expressible) ops omitted."""
    return _registry.oracle_sql()
