"""Partition-count invariance: operator RESULTS must be a pure function
of the data, never of the physical parallelism. Hash-gated sampling,
splits, dedup keep-decisions, and top-k tie-breaks are exactly the ops
where a nondeterministic implementation (RNG per task, first-row-wins
without ordering, monotonically_increasing_id leakage) would pass a
single-config oracle check yet silently change output when the cluster
re-partitions — so run each at two very different shuffle widths and
demand identical row multisets.
"""

from __future__ import annotations

import pytest

from sqlite_to_clickhouse_spark.registry import all_queries

_Q = all_queries()

# Ops whose semantics lean on hash-stable decisions most directly, plus
# one representative per family that aggregates/windows over shuffles.
_OPS = [
    "sample_deterministic",
    "split_train_holdout",
    "sample_mix_epochs",
    "sample_domain_mix",
    "dedup_exact",
    "dedup_replacing",
    "topk",
    "topk_per_group",
    "events_rfm",
    "dedup_substring_spans",
    # round-8: the collapsed LSH + persisted-index serving path — rep
    # choice (min id per set), expansions, and the pb-pruned index join
    # must not depend on shuffle width.
    "dedup_fuzzy_minhash",
    "dedup_incremental",
    "dedup_cluster_stats",
    # round-9: tombstoned lookup adds an anti-join + a per-cluster
    # re-election aggregate (min_by) — both must be width-independent.
    "dedup_incremental_deletes",
    # round-10: the persisted ER index — label propagation over star
    # edges + new pairs, last-write-wins gen window, (d, cname)
    # tie-broken best match, and the delete-time affected-cluster
    # re-label must all be width-independent.
    "er_incremental",
    "er_index_append",
    "er_index_delete",
]


def _rows(spark, sf_dir, name):
    df = _Q[name].fn(spark, sf_dir)
    cols = sorted(df.columns)
    out = [tuple(str(r[c]) for c in cols) for r in df.collect()]
    return sorted(out)


@pytest.mark.parametrize("name", _OPS)
def test_result_invariant_under_shuffle_width(spark, sf_dir, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, sf_dir, name)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name} output depends on shuffle partitioning"
