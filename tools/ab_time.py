"""Detached-worktree A/B timer: is a bench delta really caused by code?

Times the given registered queries at HEAD and at an OLD COMMIT on the
same host, same fixture, same min-of-N protocol — the only comparison
that isolates code from measurement context (cross-round bench numbers
embed different fixture generations, warm-up sequences, and host load).
Round-8 case study: sim_topk_cosine read +45% vs the r6 artifact even
on a quiet box, but this A/B showed the r6-close commit was SLOWER than
HEAD under identical conditions — no culprit commit existed.

Each side runs in its OWN fresh process (a worktree for the old commit,
the repo root for HEAD) so imports can't leak across trees.  The
worktree is created detached under /tmp and removed afterwards.

Usage:
    python tools/ab_time.py <old-commit> <query> [query...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ab_time.py ...

Exit 0 always (this is a measurement, not a gate); read the table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 3

_CHILD = r"""
import hashlib, json, sys, time
sys.path.insert(0, sys.argv[1])
from sqlite_to_clickhouse_spark.session import get_spark
from sqlite_to_clickhouse_spark.registry import all_queries

def _probe():
    # Inline twin of bench.host_speed_probe (inlined so the OLD side's
    # tree, which may predate the probe, still reports one): best-of-3
    # single-thread SHA-256 over 128 MiB — host speed, not guest load.
    buf = bytes(range(256)) * (128 * 4096)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        for i in range(0, len(buf), 1 << 24):
            h.update(buf[i:i + (1 << 24)])
        h.hexdigest()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)

def _probe_mt():
    # Multicore twin (inline for the same reason): 8 threads x 64 MiB —
    # co-tenant steal can cut aggregate throughput while one thread
    # still gets a full core, and Spark queries are multicore work.
    from concurrent.futures import ThreadPoolExecutor
    buf = bytes(range(256)) * (64 * 4096)
    def one(_):
        h = hashlib.sha256()
        for i in range(0, len(buf), 1 << 24):
            h.update(buf[i:i + (1 << 24)])
        h.hexdigest()
    best = None
    with ThreadPoolExecutor(max_workers=8) as pool:
        for _ in range(3):
            t0 = time.perf_counter()
            list(pool.map(one, range(8)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
    return round(best, 4)

sf_dir, names = sys.argv[2], sys.argv[3:]
spark = get_spark("ab-time")
reg = all_queries()
out = {}
known = [n for n in names if n in reg]
if known:
    reg[known[0]].fn(spark, sf_dir).count()  # warm-up
for n in names:
    if n not in reg:
        out[n] = None
        continue
    best = None
    for _ in range(%d):
        t0 = time.perf_counter()
        reg[n].fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[n] = round(best, 4)
out["__probe"] = _probe()
out["__probe_mt"] = _probe_mt()
print("ABTIME:" + json.dumps(out))
""" % PASSES


def run_side(tree: str, names: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, SF_DIR, *names],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABTIME:"):
            return json.loads(line[len("ABTIME:"):])
    raise SystemExit(
        f"no timing line from {tree}\n--- stderr tail ---\n{p.stderr[-2000:]}"
    )


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    commit, names = sys.argv[1], sys.argv[2:]
    wt = tempfile.mkdtemp(prefix="ab_time_")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, commit],
        check=True, capture_output=True,
    )
    try:
        old = run_side(wt, names)
        new = run_side(REPO, names)
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )
        subprocess.run(["git", "-C", REPO, "worktree", "prune"], capture_output=True)
    # Host-speed canary (r12): the sides run minutes apart, and on a
    # microVM the host can change speed between them without the guest
    # load average moving.  Each child reports a pure-CPU probe; HEAD
    # timings are normalized by the probe ratio before classification,
    # so host drift between the sides can't read as a code delta.
    po, pn = old.pop("__probe", None), new.pop("__probe", None)
    pom, pnm = old.pop("__probe_mt", None), new.pop("__probe_mt", None)
    # Normalize by the MULTICORE probe when both sides report it (the
    # queries are multicore work; a lone thread can read full-speed while
    # aggregate throughput is throttled — r12), else the 1-thread probe.
    if pom and pnm:
        scale = pom / pnm
    elif po and pn:
        scale = po / pn
    else:
        scale = 1.0
    if po and pn:
        mt = f"  mt {pom:.3f}->{pnm:.3f}s" if (pom and pnm) else ""
        print(
            f"host probe: old {po:.3f}s  HEAD {pn:.3f}s ({pn/po:.2f}x).{mt} "
            f"Columns show RAW seconds; verdicts classify HEAD x {scale:.3f} "
            "(host-normalized)."
        )
    print(f"{'query':34s} {commit[:10]:>10s} {'HEAD':>8s}  verdict")
    for n in names:
        o, h = old.get(n), new.get(n)
        if o is None or h is None:
            print(f"{n:34s} {'-':>10s} {'-':>8s}  (absent on one side)")
            continue
        h_adj = h * scale
        if h_adj <= o * 1.1:
            v = "HEAD <= old: NOT a code regression"
        elif h_adj > o * 1.25:
            v = f"HEAD {h_adj/o:.2f}x old: code-caused — bisect {commit}..HEAD"
        else:
            v = "within 25% — noise band, re-run or widen passes"
        print(f"{n:34s} {o:10.3f} {h:8.3f}  {v}")


if __name__ == "__main__":
    main()
