"""Graph-operator invariants on hand-built graphs.

The oracle gate (test_correctness) already cross-checks both registered
queries against DuckDB on the fixtures; these tests pin the library-level
semantics on graphs whose answers are known in closed form, so a fixture
regeneration can't silently weaken the checks.
"""

from __future__ import annotations

import math

import pytest

from sqlite_to_clickhouse_spark.operators.graph import pagerank, triangle_stats


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _wedges_closed_form(degs):
    return sum(d * (d - 1) // 2 for d in degs)


def test_triangle_count_k4(spark):
    # K4: 4 nodes, 6 edges, C(4,3)=4 triangles, wedges = 4 * C(3,2) = 12.
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    row = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles, row.n_wedges) == (
        4,
        6,
        4,
        12,
    )


def test_triangle_count_star_has_none(spark):
    # Star graph: hub 0 with 5 spokes — many wedges, zero triangles. This
    # is exactly the shape where the naive wedge join blows up on the hub;
    # the degree orientation enumerates every wedge at a spoke instead.
    pairs = [(0, s) for s in range(1, 6)]
    row = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == _wedges_closed_form([5, 1, 1, 1, 1, 1])


def test_triangle_count_two_sharing_an_edge(spark):
    # Two triangles glued along edge (0,1): {0,1,2} and {0,1,3}.
    pairs = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    row = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert row.n_triangles == 2


def test_pagerank_cycle_is_uniform(spark):
    # Directed 4-cycle: symmetry forces the uniform fixed point 1/4,
    # which the iteration preserves exactly from the uniform start.
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4, 1.0) for i in range(4)],
        "src long, dst long, weight double",
    )
    ranks = {r.node: r.rank for r in pagerank(edges).collect()}
    assert ranks.keys() == {0, 1, 2, 3}
    for v in ranks.values():
        assert v == pytest.approx(0.25, abs=1e-9)


def test_pagerank_mass_conserved_and_sink_ordering(spark):
    # Hub-and-authority: 1..4 all point at 0, 0 points back at 1 only.
    # Node 0 must outrank everything; nodes 2..4 (no in-links) tie at the
    # minimum; total mass stays 1 (no dangling nodes by construction).
    edges = spark.createDataFrame(
        [(u, 0, 1.0) for u in range(1, 5)] + [(0, 1, 1.0)],
        "src long, dst long, weight double",
    )
    ranks = {r.node: r.rank for r in pagerank(edges).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    assert ranks[0] == max(ranks.values())
    assert ranks[2] == ranks[3] == ranks[4] == min(ranks.values())
    assert ranks[1] > ranks[2]


def test_pagerank_weight_bias(spark):
    # 0 splits 3:1 between 1 and 2 — rank(1) > rank(2), and the exact
    # one-step values are computable by hand for one iteration; after 3
    # damped iterations the ordering (not the closed form) is the stable
    # public contract.
    edges = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, weight double",
    )
    ranks = {r.node: r.rank for r in pagerank(edges).collect()}
    assert ranks[1] > ranks[2]
    assert not any(math.isnan(v) for v in ranks.values())


def test_triangle_bitmap_and_wedge_paths_agree(spark):
    """The bitmap fast path and the general wedge path must produce
    identical censuses — checked on a pseudo-random graph dense enough
    to have thousands of triangles (hash-derived edges, deterministic)."""
    from sqlite_to_clickhouse_spark.operators.graph import triangle_stats

    n = 60
    edges = [
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if (u * 1_000_003 + v * 7919) % 5 < 2  # ~40% density, deterministic
    ]
    df = spark.createDataFrame(edges, "u long, v long")
    got_bitmap = triangle_stats(df).collect()[0]
    got_wedge = triangle_stats(df, bitmap_max_nodes=0).collect()[0]
    assert got_bitmap.asDict() == got_wedge.asDict()
    assert got_bitmap.n_triangles > 100  # non-vacuous
