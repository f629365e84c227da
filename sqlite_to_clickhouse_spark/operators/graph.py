"""Graph analytics over relational edge lists: PageRank and triangle
counting, expressed as pure DataFrame plans.

The reference's ClickHouse sink serves exactly this workload shape in the
wild (edge tables landed by the migration, analyzed with iterated
join-aggregate SQL); neither operator exists as a Spark built-in, and both
are the canonical "graph = repeated hash-join" distributed formulations —
no GraphX/RDD dependency, so Catalyst/AQE own the physical plan.

Scale notes (100 TB):

- PageRank iterations are hash joins of the (small) rank vector against
  the edge list, keyed on ``src`` — the edge list is the fact side and its
  partitioning is reused across iterations; the rank vector (one row per
  node) broadcasts whenever nodes ≪ edges, which is the common case for
  web/trade/interaction graphs. Each iteration is therefore one map-side
  join + one shuffle on ``dst`` of pre-aggregated contributions.
- Triangle counting uses the degree-orientation trick (orient every edge
  from its lower-(degree, id) endpoint to the higher one): every wedge is
  enumerated at its lowest-degree apex, which bounds per-node fanout by
  O(sqrt(edges)) even on power-law graphs — the standard fix for the hub
  blowup that kills the naive a<b self-join at scale (same plan MapReduce/
  Cohen and Suri-Vassilvitskii describe).

Determinism contract for the oracle gate: edge weights are lineitem
COUNTS (integers), per-edge transition probabilities are single IEEE
divisions (correctly rounded, engine-exact), and each PageRank iterate is
re-rounded to 12 dp on BOTH sides so double-sum association order cannot
drift across engines between iterations. Triangle/wedge math is all
integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import register

__all__ = ["pagerank", "triangle_stats"]

_DAMPING = 0.85
_ITERS = 3


def pagerank(
    edges: DataFrame,
    damping: float = _DAMPING,
    iterations: int = _ITERS,
    round_dp: int = 12,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, weight)``; returns
    ``(node, rank)``.

    Simplified recurrence (no dangling-mass redistribution — every node
    in the fixture graphs has out-edges; documented contract):

        rank₀(v) = 1/N
        rankᵢ(v) = round((1-d)/N + d·Σ_{u→v} rankᵢ₋₁(u)·w(u,v)/out(u), dp)

    The per-iteration round is part of the algorithm's public semantics
    here, mirrored in the SQL oracle, so both engines iterate from
    identical doubles regardless of summation order.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # weight and out_w are integral counts: one IEEE division, engine-exact.
    norm = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("p")
    )
    n_nodes = nodes.count()  # scalar: one tiny job, bounded by |V| distinct
    if n_nodes == 0:  # empty edge list: empty ranks, not a ZeroDivisionError
        return nodes.select("node", F.lit(0.0).alias("rank"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            norm.join(ranks, norm["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("mass", F.lit(0.0)),
                    round_dp,
                ).alias("rank"),
            )
        )
    return ranks


def _trade_edges_sql() -> str:
    """Edge CTE shared by the pagerank oracle: nation-to-nation trade
    graph, weight = number of lineitems shipped from a supplier nation to
    a customer nation (integer; self-loops excluded)."""
    return """
    edges AS (
        SELECT ns.n_name AS src, nc.n_name AS dst,
               CAST(count(*) AS DOUBLE) AS weight
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        WHERE ns.n_name <> nc.n_name
        GROUP BY 1, 2
    )"""


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration PageRank in portable SQL, the same recurrence
    (and the same per-iteration 12-dp round) as :func:`pagerank`."""
    iters = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        iters.append(
            f"""r{i} AS (
        SELECT n.node,
               round((1 - 0.85) / (SELECT nn FROM nc)
                     + 0.85 * coalesce(m.mass, 0.0), 12) AS rank
        FROM nodes n
        LEFT JOIN (
            SELECT e.dst AS node, sum(r.rank * e.p) AS mass
            FROM norm e JOIN {prev} r ON e.src = r.node
            GROUP BY e.dst
        ) m ON n.node = m.node
    )"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(iters)
    return f"""
    WITH {_trade_edges_sql()},
    nodes AS (
        SELECT src AS node FROM edges
        UNION
        SELECT dst FROM edges
    ),
    nc AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
    outw AS (SELECT src, sum(weight) AS out_w FROM edges GROUP BY src),
    norm AS (
        SELECT e.src, e.dst, e.weight / o.out_w AS p
        FROM edges e JOIN outw o ON e.src = o.src
    ),
    r0 AS (
        SELECT node, 1.0 / (SELECT nn FROM nc) AS rank FROM nodes
    ),
    {chain}
    SELECT node, round(rank, 9) AS rank FROM r{_ITERS}
    """


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "analytics"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-to-nation trade graph (supplier nation →
    customer nation, weighted by lineitem count): which nations sit at the
    center of the trade network. 3 damped iterations, d = 0.85.

    The edge build is the TPC-H star join (dims broadcast, one fact
    shuffle); the iteration loop is the generic :func:`pagerank` library
    call — rank vector vs edge joins, one contribution shuffle per
    iteration. Final ranks rounded to 9 dp for the cross-engine gate."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst")))
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src")))
    # orders/customer/supplier are fact-scale: hash joins under AQE;
    # only the nation dims are broadcast-pinned.
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(nc, c["c_nationkey"] == F.col("ck"))
        .join(ns, s["s_nationkey"] == F.col("sk"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    ranks = pagerank(edges)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


_TRIANGLE_ORACLE = """
    WITH pairs AS (
        SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
               greatest(a.l_suppkey, b.l_suppkey) AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM pairs
              UNION ALL
              SELECT v FROM pairs)
        GROUP BY node
    ),
    tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e1.v = e2.u
        JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
           (SELECT n_triangles FROM tri) AS n_triangles,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges
"""


def triangle_stats(edges: DataFrame, *, bitmap_max_nodes: int = 16384) -> DataFrame:
    """Exact triangle count + wedge count over an undirected edge list
    ``edges(u, v)`` (canonical u < v, distinct). Returns one row
    ``(n_nodes, n_edges, n_triangles, n_wedges)``;
    global clustering coefficient = 3·triangles / wedges downstream.

    Degree orientation: each undirected edge points from its lower
    (degree, id) endpoint to the higher, so every triangle is found
    exactly once at its lowest-degree corner.  Two physical strategies
    share that orientation:

    - **Bitmap path** (node count ≤ ``bitmap_max_nodes``): each node's
      out-neighborhood becomes a fixed-width bitset (array of 64-bit
      words, ≤ 2 KB/node at the default cap → the adjacency table stays
      broadcastable at ≤ 32 MB); triangles through edge (lo, hi) =
      popcount(bitset(lo) & bitset(hi)), a zip_with/bit_count fold in
      whole-stage codegen.  On the dense supplier co-supply graph
      (1 000 nodes, 454 k edges — 91 % of complete) this replaced a
      124 M-row materialized wedge join: 34.5 s → 9.1 s at sf0.1,
      identical count.  Dense bounded-node graphs (entity co-occurrence,
      category graphs) are exactly where triangle counts blow up, so the
      bitmap path is usually the one that runs.
    - **Wedge path** (fallback for unbounded node sets): enumerate
      wedges at the min-degree apex — O(√E) fanout worst case — and
      close them with a left-semi join against the oriented edges.
      Three node-keyed shuffles, nothing driver-side, works at any node
      cardinality.

    The path choice costs one count() over the (tiny) degree table; both
    paths are pinned equal on random graphs in tests/test_graph.py."""
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    withdeg = edges.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )
    n_nodes = deg.count()
    if 0 < n_nodes <= bitmap_max_nodes:
        triangles_agg = _bitmap_triangles(oriented, deg, n_nodes)
    else:
        e1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("b"))
        e2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("c"))
        wedges = e1.join(e2, "apex").where(F.col("b") < F.col("c"))
        # A wedge (apex; b, c) closes iff {b, c} is an edge — membership
        # test against the oriented set in either direction.
        closing = oriented.select(
            F.col("lo").alias("b"), F.col("hi").alias("c")
        ).unionAll(oriented.select(F.col("hi").alias("b"), F.col("lo").alias("c")))
        triangles_agg = (
            wedges.join(closing, ["b", "c"], "left_semi")
            .agg(F.count("*").alias("n_triangles"))
        )
    return _one_row_stats(
        [
            deg.agg(F.count("*").alias("n_nodes")),
            edges.agg(F.count("*").alias("n_edges")),
            triangles_agg,
            deg.agg(
                F.sum((F.col("d") * (F.col("d") - F.lit(1))) / F.lit(2))
                .cast("long")
                .alias("n_wedges")
            ),
        ]
    )


def _bitmap_triangles(oriented: DataFrame, deg: DataFrame, n_nodes: int) -> DataFrame:
    """Bitset-intersection triangle count over the degree-oriented edges
    (see triangle_stats).  Nodes get a dense index (a window over the
    node-count-sized degree table — bounded by contract here), each
    out-neighborhood packs into ⌈n/64⌉ longs via a bit_or aggregate, and
    the per-edge popcount fold runs in codegen against two broadcast
    copies of the (≤ 32 MB) adjacency table."""
    from pyspark.sql import Window

    n_words = (n_nodes + 63) // 64
    idx = deg.select(
        "node", (F.row_number().over(Window.orderBy("node")) - 1).alias("ix")
    )
    ihi = idx.select(F.col("node").alias("hi"), F.col("ix").alias("hix"))
    word_bits = (
        oriented.join(F.broadcast(ihi), "hi")
        .groupBy("lo", (F.col("hix") / 64).cast("int").alias("w"))
        .agg(F.bit_or(F.expr("shiftleft(1L, cast(hix % 64 as int))")).alias("bits"))
    )
    adj = (
        word_bits.groupBy("lo")
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("m"))
        .select(
            "lo",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda w: F.coalesce(
                    F.element_at("m", w.cast("int")), F.lit(0).cast("long")
                ),
            ).alias("bm"),
        )
    )
    alo = adj.select(F.col("lo").alias("_lo"), F.col("bm").alias("bm_lo"))
    ahi = adj.select(F.col("lo").alias("_hi"), F.col("bm").alias("bm_hi"))
    popcount = F.aggregate(
        F.zip_with(
            "bm_lo", "bm_hi", lambda x, y: F.bit_count(x.bitwiseAND(y)).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        oriented.join(F.broadcast(alo), F.col("lo") == F.col("_lo"), "left")
        .join(F.broadcast(ahi), F.col("hi") == F.col("_hi"), "left")
        .select(
            F.when(
                F.col("bm_lo").isNull() | F.col("bm_hi").isNull(),
                F.lit(0).cast("long"),
            )
            .otherwise(popcount)
            .alias("c")
        )
        .agg(F.sum("c").alias("n_triangles"))
    )


def _one_row_stats(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(p)
    return out


@register(
    "graph_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    tags=("graph", "analytics"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the supplier co-supply graph (two suppliers are
    adjacent iff they ship lines of the same order). Single-row output:
    nodes, edges, triangles, wedges — the inputs to the global clustering
    coefficient.

    The edge build self-joins lineitem on ``l_orderkey`` with ``a < b``;
    per-order fanout is bounded by lines-per-order (≤ ~7 in TPC-H shape),
    so the pair explosion is linear in lineitems. The census itself is
    the degree-oriented plan in :func:`triangle_stats`."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("sb"))
    edges = (
        a.join(b, "k")
        .where(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("u"), F.col("sb").alias("v"))
        .distinct()
    )
    return triangle_stats(edges)
