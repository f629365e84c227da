"""SQL entry-point parity (SURVEY.md §3.2): the engine's ops must be
reachable from `spark.sql(...)` as well as the DataFrame API. For every
operator whose oracle SQL is ANSI (no DuckDB-only functions), run that
exact SQL through Spark SQL on temp views and compare with the DataFrame
implementation — one assertion covering parser, analyzer, and the
operator's SQL spelling at once."""

from __future__ import annotations

import math

import pytest

from sqlite_to_clickhouse_spark.io import TABLES, table
from sqlite_to_clickhouse_spark.registry import all_queries

_Q = all_queries()

# Oracles that are pure ANSI — parse and evaluate identically in Spark SQL.
_ANSI_OPS = [
    "pricing_summary",
    "filter_predicate",
    "join_inner_hash",
    "join_left",
    "join_right",
    "join_full",
    "join_semi",
    "join_anti",
    "join_cross_theta",
    "agg_global",
    "agg_groupby_hash",
    "agg_distinct",
    "agg_filtered",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "window_rank",
    "window_lag_lead",
    "window_running",
    "sort_multi",
    "topk",
    "topk_per_group",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "dedup_replacing",
    "udf_python",          # the oracle is its pure-SQL CASE WHEN equivalent
    "udf_pandas_grouped_agg",
    # dedup_exact's oracle uses DuckDB's sha256(); Spark spells it sha2(x,256)
    "text_lang_filter",
    "events_funnel",
    "events_retention",
    "agg_histogram",
    "window_cume_dist",
    "sink_partitioned_parquet",
    "events_sequence_count",
    "agg_bitwise_bool",
    "agg_unpivot",
    # fn_editdistance left out: its oracle's ASCII projection needs
    # DuckDB's regexp_replace(..., 'g') flag (DuckDB replaces FIRST by
    # default where Spark replaces ALL) — not portable Spark SQL.
    "fn_format",
    "fn_date_extra",
    "query_shipping_priority",
    "query_supplier_volume",
    "query_part_margin",
    "agg_moments",
    "fn_math_advanced",
    "join_merge_hint",
    "filter_exists_subquery",
    "join_lateral",
    # Round-5 TPC-H shapes + reconciliation ops whose oracles are pure ANSI
    # (the rest use DuckDB list_*/strftime/timezone spellings).
    "query_min_cost_supplier",
    "query_priority_late",
    "query_local_supplier_volume",
    "query_nation_volume_shipping",
    "query_important_parts",
    "query_priority_linestatus",
    "query_order_count_distribution",
    "query_supplier_cnt",
    "query_part_promotion_suppliers",
    "query_waiting_suppliers",
    "join_any_left",
    "agg_incremental_merge",
    "migrate_verify_diff",
]


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    yield
    for t in TABLES:
        spark.catalog.dropTempView(t)


def _norm(rows):
    out = []
    for r in rows:
        cells = []
        for v in r:
            if isinstance(v, float):
                cells.append(f"{v:.9g}" if not math.isnan(v) else "NaN")
            else:
                cells.append(str(v))
        out.append(tuple(cells))
    return sorted(out)


@pytest.mark.parametrize("name", _ANSI_OPS)
def test_sql_string_matches_dataframe(spark, sf_dir, name):
    q = _Q[name]
    df_api = q.fn(spark, sf_dir)
    sql_api = spark.sql(q.oracle)
    assert sorted(df_api.columns) == sorted(sql_api.columns)
    cols = df_api.columns
    assert _norm([tuple(r) for r in df_api.collect()]) == _norm(
        [tuple(r[c] for c in cols) for r in sql_api.collect()]
    ), name
