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

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
