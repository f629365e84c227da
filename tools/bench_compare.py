"""Classify a bench delta: real regression or host-load artifact.

Compares two bench artifacts per-query and applies the measurement
discipline this repo learned the hard way (SURVEY §6.8, memory round 7):

- a LOAD artifact lifts (nearly) every query by a similar factor — the
  median ratio moves, the spread stays tight;
- a CODE regression is query-localized — a few ratios stand far above a
  ~1.0 median;
- and even a localized, quiet-box-reproducible delta is only proven
  code-caused by the detached-worktree A/B (tools/ab_time.py), because
  cross-round numbers embed different fixture generations and warm-up
  contexts.

Inputs: two paths, each either a ``BENCH_FULL.json`` (this repo's full
per-query map) or a driver ``BENCH_r{N}.json`` (the JSON line is parsed
out of the recorded tail).  Queries present in both are compared.

Usage:
    python tools/bench_compare.py BENCH_r07.json BENCH_FULL.json
    python tools/bench_compare.py old.json new.json --top 10

Exit code: 0 = uniform/noise classification, 2 = localized suspects
found (listed; take them to ab_time.py before calling them regressions).
"""

from __future__ import annotations

import json
import re
import statistics
import sys

# Below this wall-clock, per-query ratios are scheduler noise, not signal.
MIN_SEC = 0.05
# A suspect must exceed BOTH the uniform-lift envelope (median × slack)
# and an absolute floor, so a 0.06 s → 0.11 s blip never pages anyone.
SLACK = 1.35
ABS_FLOOR_S = 0.15


def load(path: str) -> "tuple[dict[str, float], float | None, float | None]":
    """(queries map, host_probe_sec, host_probe_mt_sec) of one artifact
    (probes None when the artifact predates them)."""
    with open(path) as fh:
        d = json.load(fh)
    if "tail" in d:  # driver BENCH_r{N}.json: JSON line inside the tail
        m = re.search(r'\{"metric".*', d["tail"])
        if not m:
            raise SystemExit(f"{path}: no JSON line in tail")
        d = json.loads(m.group(0))
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no queries map")
    probe = d.get("derived", {}).get("host_probe_sec")
    probe_mt = d.get("derived", {}).get("host_probe_mt_sec")
    return (
        {k: float(v) for k, v in q.items()},
        float(probe) if probe else None,
        float(probe_mt) if probe_mt else None,
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 8
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else top
    if len(args) != 2:
        raise SystemExit(__doc__)
    (old, old_probe, old_mt), (new, new_probe, new_mt) = load(args[0]), load(args[1])
    common = [
        k for k in old if k in new and old[k] >= MIN_SEC and new[k] >= MIN_SEC
    ]
    if len(common) < 5:
        raise SystemExit(f"only {len(common)} comparable queries — not enough")
    ratios = {k: new[k] / old[k] for k in common}
    med = statistics.median(ratios.values())
    spread = statistics.quantiles(ratios.values(), n=4)
    print(f"n={len(common)}  median ratio {med:.2f}  IQR [{spread[0]:.2f}, {spread[2]:.2f}]")
    # Host-speed canary (r12): both artifacts carry a pure-CPU probe, so
    # the host's speed difference between the two runs is a MEASUREMENT
    # — co-tenant steal on a microVM never shows in guest load average.
    # Prefer the MULTICORE probe ratio as the normalizer when both
    # artifacts carry it: queries are multicore work, and co-tenant steal
    # can throttle aggregate throughput while a single thread still gets
    # a full core (r12: 188 s → 210 s same-tree with the 1-thread probe
    # IMPROVING).  The 1-thread ratio stays printed for older artifacts
    # and as a second opinion.
    probe_ratio = None
    if old_probe and new_probe:
        st_ratio = new_probe / old_probe
        probe_ratio = st_ratio
        print(f"host probe(1t) {old_probe:.3f}s -> {new_probe:.3f}s ({st_ratio:.2f}x)")
    if old_mt and new_mt:
        mt_ratio = new_mt / old_mt
        probe_ratio = mt_ratio
        print(f"host probe(mt) {old_mt:.3f}s -> {new_mt:.3f}s ({mt_ratio:.2f}x)")
    if probe_ratio:
        print(f"host-adjusted median {med / probe_ratio:.2f}x")
    # The VERDICT gates on the host-adjusted median when probes exist:
    # gating on the raw median would let a host that got FASTER between
    # runs mask a uniform code regression as "within noise" (the exact
    # inverse of the phantom-lift problem the probe was added for).
    med_adj = med / probe_ratio if probe_ratio else med

    suspects = [
        k
        for k, r in ratios.items()
        if r > med * SLACK and (new[k] - old[k] * med) > ABS_FLOOR_S
    ]
    suspects.sort(key=lambda k: -ratios[k])
    for k in sorted(common, key=lambda k: -ratios[k])[:top]:
        mark = "  <-- SUSPECT" if k in suspects else ""
        print(f"{ratios[k]:5.2f}x  {k:34s} {old[k]:7.3f} -> {new[k]:7.3f}{mark}")

    if med_adj > 1.15 and not suspects:
        if probe_ratio:
            print(
                f"\nverdict: UNIFORM lift with host-adjusted median "
                f"{med_adj:.2f}x (raw {med:.2f}x, probe {probe_ratio:.2f}x) "
                "— the host does NOT explain it; treat as a uniform code/"
                "fixture change and A/B a few queries via tools/ab_time.py."
            )
        else:
            print(
                f"\nverdict: UNIFORM {med:.2f}x lift, no localized suspects — "
                "host-load signature; re-run on a quiet box (check uptime) "
                "before reading anything into it."
            )
    elif med > 1.15 and not suspects and probe_ratio:
        print(
            f"\nverdict: UNIFORM {med:.2f}x lift fully explained by "
            f"the measured {probe_ratio:.2f}x host-speed delta "
            f"(host-adjusted median {med_adj:.2f}x) — the "
            "box changed, the code didn't."
        )
    elif suspects:
        print(
            f"\nverdict: {len(suspects)} localized suspect(s) above the "
            f"{med:.2f}x envelope — reproduce on a quiet box, then run "
            "tools/ab_time.py <old-commit> <query...> before calling it a "
            "code regression (round 8: a +45% quiet-box delta A/B'd to "
            "NOT-code — the old commit was slower under identical "
            "conditions)."
        )
        sys.exit(2)
    else:
        print("\nverdict: within noise — nothing to chase.")


if __name__ == "__main__":
    main()
