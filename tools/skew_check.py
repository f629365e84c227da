"""Skew validation: time shuffle-heavy operators on the sf0.1 fixture vs
a SKEWED copy of it (same row counts; one hot key owns half of each fact
table) and report the wall-clock ratio.

Hot keys are the canonical 100 TB failure: a uniform hash shuffle sends
the hot key's rows to ONE reducer, so a 1000-task stage degenerates to a
single straggler. The engine's defenses are AQE skew-join splitting
(session.py enables it), map-side partial aggregation (hot GROUP BY keys
collapse before the wire), and explicit salting (join_skew_salted). An op
whose wall blows up by ~partition-count on the skewed copy has no
defense; a healthy ratio is ≲2×.

Usage: python tools/skew_check.py [ops...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SKEW_BASE", "/root/testdata/sf0.1")
SKEWED = os.path.join(
    REPO, ".scale", "skew" + ("_x10" if "x10" in BASE else "")
)

# Shuffle-heavy ops over the skewed tables (events.user_id, lineitem
# l_orderkey/l_suppkey, orders.o_custkey).
DEFAULT_OPS = [
    "agg_groupby_hash",
    "join_inner_hash",
    "join_skew_salted",
    "window_running",
    "events_sessionize",
    "events_gap_stats",
    "topk_per_group",
    "agg_delta_sum",
    "dedup_replacing",
    "query_order_count_distribution",
]


def make_skewed() -> None:
    """Same row counts, one hot key owning ~half of each fact table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(SKEWED, exist_ok=True)
    import shutil

    hot = {
        "events": ("user_id", 1),
        "lineitem": ("l_suppkey", 1),
        "orders": ("o_custkey", 1),
    }
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{BASE}/{t}.parquet"
        dst = f"{SKEWED}/{t}.parquet"
        if t not in hot:
            shutil.copy(src, dst)
            continue
        col, hot_val = hot[t]
        tab = pq.read_table(src)
        n = tab.num_rows
        mask = pa.array([i % 2 == 0 for i in range(n)])
        c = pc.if_else(
            mask,
            pa.array([hot_val] * n, type=tab.schema.field(col).type),
            tab.column(col).combine_chunks(),
        )
        cols = {name: tab.column(name) for name in tab.schema.names}
        cols[col] = c
        pq.write_table(pa.table(cols), dst)
        print(f"{t}: {n} rows, 50% of {col} -> {hot_val}", flush=True)


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS
    if not os.path.isdir(SKEWED):
        make_skewed()

    from sqlite_to_clickhouse_spark.registry import all_queries
    from sqlite_to_clickhouse_spark.session import get_spark

    spark = get_spark("skew-check")
    reg = all_queries()

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        return best

    reg[ops[0]].fn(spark, BASE).count()  # warm JVM
    reg[ops[0]].fn(spark, SKEWED).count()

    print(f"{'op':32s} {'uniform':>8s} {'skewed':>8s} {'ratio':>7s}")
    flagged = []
    for name in ops:
        tu = run(name, BASE)
        ts = run(name, SKEWED)
        ratio = ts / tu if tu > 0 else float("inf")
        flag = " <-- SKEW-SENSITIVE" if ratio > 3.0 and ts > 2.0 else ""
        if flag:
            flagged.append(name)
        print(f"{name:32s} {tu:8.2f} {ts:8.2f} {ratio:6.1f}x{flag}", flush=True)
    print(f"\nflagged: {flagged or 'none'}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
