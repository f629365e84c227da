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
# relational/join/agg family (the natural first 50); round 2 promotes the
# LLM-pipeline family (text/dedup/similarity/multimodal/events/sampling) plus
# the two aggregates whose array outputs were re-serialized for the gate.
_PRIORITY: list[str] = [
    "agg_group_array",
    "agg_quantiles_multi",
    "window_ntile",
    "text_tokens",
    "text_term_freq",
    "text_tfidf",
    "text_lang_filter",
    "text_langid",
    "text_quality",
    "doc_fingerprint",
    "text_ngrams",
    "text_bpe_tokens",
    "text_line_dedup",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_fuzzy_minhash",
    "dedup_simhash",
    "dedup_connected_components",
    "dedup_containment",
    "dedup_adjacent",
    "sim_topk_cosine",
    "dedup_embedding_cosine",
    "dedup_embedding_bucketed",
    "sim_cosine_pairs",
    "multimodal_metadata",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "scan_binary_files",
    "events_funnel",
    "events_retention",
    "events_sequence_count",
    "events_user_path",
    "events_sessionize",
    "events_anomaly_zscore",
    "timeseries_gap_fill",
    "split_train_holdout",
    "sample_deterministic",
    "pipeline_corpus_clean",
    "sample_stratified_hash",
    "pipeline_pack_sequences",
    "window_running",
    "window_range_frame",
    "dedup_replacing",
    "window_first_last",
    "window_cume_dist",
    "window_time_range",
    "window_median",
    "window_rolling_distinct",
    "window_fill_forward",
    "window_ratio_to_report",
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
