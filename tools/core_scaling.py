"""Core-scaling evidence (VERDICT r12 item 5): time the heaviest operators
on the 10x fixture at a LOW and a HIGH core count and record the warm
speedup HIGH/LOW per op.  At sf0.1 every op is overhead-bound and 8 cores
beats 32 on the warm total (PERF_r12 scaling block); this opt-in artifact
shows which plans actually parallelize once there is data to chew on —
and documents, for the ones that do not, why (driver/overhead-bound by
design: manifest commits, driver union-find, streaming machinery).

Protocol: one fresh process per core count (master local[N] via
SPARK_GRAFT_CPUS, same path bench.py uses), each op run twice in the warm
session, min taken — the bench's min-of-2 methodology at 10x.  Host-speed
probes (1t + 8t SHA-256, same as bench.py) recorded per side so a
cross-side host swing is visible in the artifact.

Usage:  python tools/core_scaling.py [ops...]      (default: the heavy set)
Writes: SCALING.json at the repo root.  The bench contract (env vars,
one-line JSON on stdout) is untouched — this tool is opt-in and separate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_DIR = os.path.join(REPO, ".scale", "x10")

DEFAULT_OPS = [
    "dedup_fuzzy_minhash",
    "dedup_threshold_sweep",
    "dedup_index_compact",
    "stream_incremental_dedup",
    "er_index_append",
    "text_tfidf",
    "query_market_share",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.environ["SPARK_GRAFT_CPUS"] = sys.argv[2]
from bench import host_speed_probe, host_speed_probe_mt  # noqa: E402
from sqlite_to_clickhouse_spark.session import get_spark  # noqa: E402
from sqlite_to_clickhouse_spark.registry import all_queries  # noqa: E402

sf_dir, names = sys.argv[3], sys.argv[4:]
spark = get_spark("core-scaling")
spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm session
q = all_queries()
out = {"probe_1t": host_speed_probe(), "probe_mt": host_speed_probe_mt()}
for name in names:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        q[name].fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
print("CORE_SCALING_JSON " + json.dumps(out))
"""


def run_side(cpus: int, ops: list) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, REPO, str(cpus), SCALE_DIR, *ops],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    for line in r.stdout.splitlines():
        if line.startswith("CORE_SCALING_JSON "):
            return json.loads(line[len("CORE_SCALING_JSON "):])
    sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
    raise SystemExit(f"child at {cpus} cores produced no result line")


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS
    if not os.path.isdir(SCALE_DIR):
        raise SystemExit("run `python tools/make_scale.py 10` first")
    low, high = 8, 32
    lo = run_side(low, ops)
    hi = run_side(high, ops)
    per = {}
    for op in ops:
        per[op] = {
            f"c{low}": lo[op],
            f"c{high}": hi[op],
            "speedup": round(lo[op] / hi[op], 3) if hi[op] else None,
        }
    doc = {
        "k": 10,
        "sf_dir": SCALE_DIR,
        "cpus_low": low,
        "cpus_high": high,
        "probes": {
            f"c{low}": {"1t": lo["probe_1t"], "mt": lo["probe_mt"]},
            f"c{high}": {"1t": hi["probe_1t"], "mt": hi["probe_mt"]},
        },
        "per_query": per,
    }
    path = os.path.join(REPO, "SCALING.json")
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
