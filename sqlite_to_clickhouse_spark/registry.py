"""Central operator/query registry.

Every operator in the engine registers itself here with a name (the key the
driver's correctness harness checks, SURVEY.md §2b), a callable
``(spark, sf_dir) -> DataFrame``, and — when the semantics are
SQL-expressible — an equivalent ANSI SQL string that DuckDB can execute on
the same parquet tables (the oracle).

Conventions enforced here so the driver's order-insensitive value-hash
comparison is stable:

- every computed/aggregate column is aliased identically in the Spark code
  and the oracle SQL;
- floating-point aggregates are ``round()``-ed to a fixed number of decimals
  on BOTH sides (IEEE sums in different orders differ in the last ulp;
  rounding makes the hash deterministic);
- any query whose output depends on order (top-k, limit) breaks ties on a
  unique key so both engines pick the same rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None for rows-only (⊘) checks
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, RegisteredQuery] = {}

# The driver's correctness gate verifies the FIRST 50 entries of ``queries()``
# (registration order).  To rotate driver-side verification across the whole
# registry over successive rounds, ``all_queries()`` emits the names below
# first, then the rest in registration order.  Round 1 verified the
# relational/join/agg family (the natural first 50); rounds 2-3 the
# LLM-pipeline family.  Round 4's window = the 15 ops that errored/failed in
# CORRECTNESS_r03 (proving the events-ts loader fix and the two oracle int-
# width casts) + 35 never-verified ops (fn_*, oracle-bearing stream_*,
# udf_*/udtf_*, two sort/set).  The ~26 still-never-verified (scans/sinks,
# rest of sort/set, no-oracle ops) rotate into round 5.
_PRIORITY: list[str] = [
    # -- r3 failures, now fixed --
    "agg_group_array",
    "text_lang_filter",
    "dedup_adjacent",
    "events_funnel",
    "events_retention",
    "events_sequence_count",
    "events_user_path",
    "events_sessionize",
    "events_anomaly_zscore",
    "timeseries_gap_fill",
    "window_running",
    "dedup_replacing",
    "window_time_range",
    "window_rolling_distinct",
    "window_fill_forward",
    # -- round-4 new operators (first driver certification) --
    "text_repetition",
    "text_decontaminate",
    "text_idf_filter",
    "dedup_corpus_apply",
    "sim_pq_quantize",
    "join_asof_nearest",
    # -- never-verified: scalar function battery (rest rotate in r5:
    #    fn_date_extra fn_json_struct fn_math_advanced fn_regex fn_struct
    #    fn_try_arith) --
    "fn_string",
    "fn_date",
    "fn_math",
    "fn_conditional",
    "fn_json",
    "fn_array",
    "fn_map",
    "fn_hash",
    "fn_bitwise",
    "fn_url",
    "fn_time_bucket",
    "fn_editdistance",
    "fn_format",
    # -- never-verified: streaming (oracle-bearing) --
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_static_join",
    "stream_foreach_sink",
    "stream_stream_join",
    "stream_custom_stateful",
    # -- never-verified: UDF/UDTF family --
    "udf_python",
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "udtf_explode",
    "udtf_posexplode",
    "udf_pandas_cogrouped",
    # -- never-verified: sort/set picks --
    "sort_multi",
    "topk_per_group",
]


def register(name: str, oracle: Optional[str] = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query callable under ``name``.

    ``oracle`` is the DuckDB-executable ANSI SQL equivalent; pass ``None``
    for genuinely non-SQL-expressible ops (the driver then records a weaker
    rows-only check — keep those to a minimum).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, RegisteredQuery]:
    """Return the full registry, forcing all operator modules to load."""
    # Imported lazily to avoid a circular import (plans imports operator
    # modules, operator modules import this registry).
    import sqlite_to_clickhouse_spark.plans  # noqa: F401

    ordered: dict[str, RegisteredQuery] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
