"""Driver-fit contract + degenerate-input guards for the sample-fit sites
(kmeans_centroids, pq_codebooks): the budget assertion must fire BEFORE any
oversized collect, zero embeddings must not poison centroids with NaN, and
a sample with no modular seed rows must still yield a usable quantizer."""

from __future__ import annotations

import math

import pytest

from sqlite_to_clickhouse_spark.operators.similarity import (
    DRIVER_FIT_BUDGET_BYTES,
    _check_driver_fit,
    kmeans_centroids,
    pq_codebooks,
)


def test_budget_math():
    _check_driver_fit(50_000, 64, "ok")  # the shipped caps: ~25 MB
    with pytest.raises(ValueError, match="driver-fit budget"):
        _check_driver_fit(DRIVER_FIT_BUDGET_BYTES // 8 + 1, 1, "too-big")


def test_kmeans_budget_fires_before_collect(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(10)], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="kmeans_centroids"):
        kmeans_centroids(df, train_cap=DRIVER_FIT_BUDGET_BYTES)  # cap x dim x 8 >> budget


def test_kmeans_zero_vector_no_nan(spark):
    rows = [(i, [float(i % 3 + 1), 1.0, 0.5, 2.0]) for i in range(1, 40)]
    rows.append((0, [0.0, 0.0, 0.0, 0.0]))  # zero embedding, also a seed (0 % k == 0)
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = kmeans_centroids(df, init_every=10, iters=2, train_cap=100).collect()
    assert cents, "no centroids produced"
    for r in cents:
        assert all(math.isfinite(x) for x in r["c_emb"]), f"NaN centroid: {r}"


def test_kmeans_no_seed_rows_falls_back(spark):
    # every id % 100 != 0 — the seed mask is empty; must fall back, not raise
    rows = [(i, [float(i), 1.0]) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = kmeans_centroids(df, init_every=100, iters=2, train_cap=100).collect()
    assert len(cents) >= 1


def test_kmeans_empty_input(spark):
    df = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert kmeans_centroids(df, train_cap=10).collect() == []


def test_pq_budget_fires(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(10)], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="pq_codebooks"):
        pq_codebooks(df, m=2, k=2, train_cap=DRIVER_FIT_BUDGET_BYTES)
