"""Plan assembly: importing this package loads every operator module so
their ``@register`` side effects populate the registry (SURVEY.md §2b is
the checklist; each module below covers one family)."""

from __future__ import annotations

import importlib

_OPERATOR_MODULES = [
    "sqlite_to_clickhouse_spark.operators.relational",
    "sqlite_to_clickhouse_spark.operators.tpch_extra",
    "sqlite_to_clickhouse_spark.operators.joins",
    "sqlite_to_clickhouse_spark.operators.aggregates",
    "sqlite_to_clickhouse_spark.operators.windows",
    "sqlite_to_clickhouse_spark.operators.sortset",
    "sqlite_to_clickhouse_spark.functions.scalar",
    "sqlite_to_clickhouse_spark.operators.text",
    "sqlite_to_clickhouse_spark.operators.dedup",
    "sqlite_to_clickhouse_spark.operators.similarity",
    "sqlite_to_clickhouse_spark.streaming.ops",
    "sqlite_to_clickhouse_spark.functions.udfs",
    "sqlite_to_clickhouse_spark.operators.etl",
    "sqlite_to_clickhouse_spark.operators.multimodal",
    "sqlite_to_clickhouse_spark.operators.eventsops",
    "sqlite_to_clickhouse_spark.operators.sampling",
    "sqlite_to_clickhouse_spark.operators.llm_extra",
    "sqlite_to_clickhouse_spark.operators.graph",
    "sqlite_to_clickhouse_spark.operators.entity",
]

for _mod in _OPERATOR_MODULES:
    importlib.import_module(_mod)
