"""Property-based check of connected_components: on random small graphs,
iterative label propagation must agree with a driver-side union-find."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # canonical label = min node of each component
    comp_min = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from sqlite_to_clickhouse_spark.operators.dedup import connected_components

    spark = spark
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        r.node: r.component_id for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)
