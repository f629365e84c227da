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
# first, then the rest in registration order.  History: r1 verified the
# relational/join/agg family; r2-r3 the LLM-pipeline family; r4 the r3
# regressions + fn_*/stream_*/udf_* batteries (49/50 green).  Round 5's
# window = ALL 32 never-driver-verified ops (scans/sinks, sort/limit/set
# algebra, the remaining fn_* extensions, merge/migrate/maintenance, and the
# three ⊘ rows-only ops) + the 3 rows whose latest driver record is red
# (fn_math — oracle SIGN type-tag fixed this round; agg_approx_distinct /
# agg_approx_percentile — r1 "no_oracle", reworked in r4 into bound-as-result
# gates that have never been driver-exercised) + 15 freshness re-certs of the
# oldest r1-green §2b rows (two fixture regenerations old).  After this
# window, every registered op has been driver-checked at least once
# (ever-verified 133 → 165/165).
_PRIORITY: list[str] = [
    # -- never-verified: sources / sinks / migrate --
    "scan_jdbc",
    "sink_parquet",
    "migrate_sqlite_roundtrip",
    "scan_csv",
    "scan_json",
    "scan_orc",
    "scan_range",
    "scan_schema_evolution",
    "sink_partitioned_parquet",
    "sink_sorted_clustered",
    "catalog_scan",
    "maintenance_delete_rows",
    # -- never-verified: sort / limit / set algebra --
    "limit_offset",
    "topk",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_except_all",
    # -- never-verified: scalar-function extensions --
    "fn_date_extra",
    "fn_json_struct",
    "fn_math_advanced",
    "fn_regex",
    "fn_struct",
    "fn_try_arith",
    # -- never-verified: merge / CDC / keys / DPP --
    "merge_upsert",
    "merge_scd2",
    "etl_surrogate_keys",
    "join_dynamic_partition_pruning",
    # -- never-verified: ⊘ rows-only (sim_ann_ivf recall-tested locally;
    #    sink_jdbc_clickhouse = DDL manifest; watermark ⊘ by design) --
    "sim_ann_ivf",
    "sink_jdbc_clickhouse",
    "stream_watermark_late",
    # -- red re-certs: fn_math oracle SIGN→DOUBLE cast landed this round;
    #    approx sketches' bound-as-result gates first driver exposure --
    "fn_math",
    "agg_approx_distinct",
    "agg_approx_percentile",
    # -- new round-5 ops: first driver certification --
    "text_pii_scrub",
    "window_distribution",
    "agg_mode",
    "embedding_normalize",
    # -- freshness re-certs: oldest r1-green §2b rows.  join_asof kept in
    #    this slice because the asof library code changed post-r4 (micros
    #    comparison); join_semi/anti/range + agg_distinct rotate in r6 —
    #    all were locally re-verified at sf0.01 this round. --
    "scan_parquet",
    "project_cast_typemap",
    "filter_predicate",
    "project_computed",
    "join_inner_hash",
    "join_broadcast",
    "join_left",
    "join_full",
    "join_asof",
    "agg_global",
    "agg_groupby_hash",
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
