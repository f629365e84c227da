"""Properties of the mixture planner and URL-canonicalization dedup the
differential gate can't see: the epoch cap engaging on a skewed corpus,
plan-share conservation, and the canonicalizer actually merging every
messy variant family."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from sqlite_to_clickhouse_spark.operators.dedup import dedup_url_canonical
from sqlite_to_clickhouse_spark.operators.sampling import (
    _MIX_MAX_EPOCHS,
    sample_mixture_weights,
)


def _write_docs(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_mixture_cap_engages_on_skew(spark, tmp_path):
    """A tiny source under a uniform token target would need >> cap
    epochs; the plan must clip it at _MIX_MAX_EPOCHS exactly and mark it
    capped, while the dominant source absorbs the rest uncapped."""
    rows = [
        Row(doc_id=i, text="w " * 100, lang="en", source="big", n_chars=200)
        for i in range(50)
    ] + [Row(doc_id=100, text="w w", lang="en", source="tiny", n_chars=3)]
    sf = _write_docs(spark, tmp_path, rows)
    plan = {r.source: r for r in sample_mixture_weights(spark, sf).collect()}
    tiny, big = plan["tiny"], plan["big"]
    assert tiny.capped
    assert tiny.epochs == float(_MIX_MAX_EPOCHS)
    assert tiny.realized_tokens == _MIX_MAX_EPOCHS * tiny.n_tokens
    assert not big.capped
    # Uncapped source draws exactly total // S tokens.
    total = tiny.n_tokens + big.n_tokens
    assert big.realized_tokens == total // 2


def test_mixture_shares_sum_to_one(spark, sf_dir):
    rows = sample_mixture_weights(spark, sf_dir).collect()
    assert rows
    assert sum(r.realized_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.natural_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        assert 0 < r.epochs <= _MIX_MAX_EPOCHS + 1e-9
        # capped => the clip branch won exactly (tie goes to uncapped,
        # which is fine: at a tie the two branches are equal anyway)
        if r.capped:
            assert r.realized_tokens == _MIX_MAX_EPOCHS * r.n_tokens
            assert r.epochs == float(_MIX_MAX_EPOCHS)


def test_url_canonical_merges_variant_family(spark, tmp_path):
    """doc_ids 0..3 (same doc_id//7 bucket, same id param mod 3 for 0 and
    3) produce the four messy spellings; the canonicalizer must merge
    exactly the rows whose (source, doc_id//7, doc_id%3) agree —
    case/port/fragment/utm/trailing-slash differences never split a
    group, the id param always does."""
    rows = [
        Row(doc_id=i, text="t", lang="en", source="src0", n_chars=1)
        for i in range(7)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = dedup_url_canonical(spark, sf).collect()
    # Expected: groups {0,3,6}, {1,4}, {2,5} -> keepers 0, 1, 2.
    keepers = sorted(r.keep_doc_id for r in out)
    assert keepers == [0, 1, 2]
    sizes = {r.keep_doc_id: r.n_docs for r in out}
    assert sizes == {0: 3, 1: 2, 2: 2}
    # Every canonical URL is actually canonical: lowercase authority, no
    # port, no fragment, no utm params, no trailing slash.
    for r in out:
        cu = r.canonical_url
        assert cu == cu.lower()
        assert ":443" not in cu and "#" not in cu and "utm_" not in cu
        assert not cu.split("?")[0].endswith("/")
        assert r.n_raw_variants >= 2


def test_url_canonical_keeps_min_and_conserves(spark, sf_dir):
    out = dedup_url_canonical(spark, sf_dir).collect()
    from sqlite_to_clickhouse_spark.io import table

    total = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == total
    for r in out:
        assert r.n_raw_variants <= r.n_docs
