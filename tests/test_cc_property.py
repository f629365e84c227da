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
    """BOTH execution paths (r12: the driver union-find fast path is the
    default under the edge cap; driver_edge_cap=0 forces the distributed
    label-propagation loop) must agree with the reference union-find —
    without the explicit cap=0 leg this test would compare union-find to
    union-find and stop covering the loop at all."""
    from sqlite_to_clickhouse_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "src: long, dst: long")
    want = _union_find(edges)
    got_driver = {
        r.node: r.component_id for r in connected_components(df).collect()
    }
    got_loop = {
        r.node: r.component_id
        for r in connected_components(df, driver_edge_cap=0).collect()
    }
    assert got_driver == want
    assert got_loop == want


def test_cc_driver_and_loop_agree_on_string_nodes(spark):
    """The driver fast path orders labels with Python string comparison,
    the loop with Spark's UTF8 binary comparison — these coincide because
    UTF-8 byte order preserves codepoint order.  Pinned on names that
    would expose a divergence if it existed (ASCII mixed with multi-byte
    codepoints sorting after all ASCII)."""
    from sqlite_to_clickhouse_spark.operators.dedup import connected_components

    edges = [
        ("anchor brass", "anchor brassy"),
        ("anchor brassy", "ànchor brass"),   # multi-byte first char
        ("zebra", "Ω-node"),                 # Greek after all ASCII
        ("café", "cafe"),
        ("solo-a", "solo-b"),
    ]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    driver = sorted(
        (r.node, r.component_id) for r in connected_components(df).collect()
    )
    loop = sorted(
        (r.node, r.component_id)
        for r in connected_components(df, driver_edge_cap=0).collect()
    )
    assert driver == loop
    # closed form: {anchor*, ànchor*} one component labeled by the ASCII
    # min; {zebra, Ω-node} labeled "zebra"? No — "zebra" < "Ω-node" in
    # codepoint order (U+03A9 > 'z'), so "zebra" is the label.
    comp = dict(driver)
    assert comp["Ω-node"] == "zebra"
    assert comp["ànchor brass"] == "anchor brass"
