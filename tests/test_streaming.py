"""Streaming tests (SURVEY.md §5.5): batch-vs-stream equivalence for every
stream_* op with a SQL oracle, plus a genuine watermark late-drop test that
feeds files in reverse event-time order so the second micro-batch arrives
entirely behind the watermark."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import all_queries

_Q = all_queries()

_ORACLE_STREAM_OPS = [
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_foreach_sink",
]


@pytest.mark.parametrize("name", _ORACLE_STREAM_OPS)
def test_stream_matches_oracle(spark, sf_dir, duck, name):
    from utils import assert_df_matches_oracle

    q = _Q[name]
    assert_df_matches_oracle(q.fn(spark, sf_dir), duck, q.oracle, name)


def test_stream_tumbling_equals_batch_window(spark, sf_dir):
    """Stream (AvailableNow) and batch window() aggs over the same file must
    agree exactly — the incrementalized plan computes the batch answer."""
    streamed = _Q["stream_tumbling"].fn(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "cnt", "sum_value")
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_watermark_drops_late_batch(spark, tmp_path):
    """Feed three files in reverse event-time order (latest third first,
    earliest third last) with maxFilesPerTrigger=1. Spark's late-record
    watermark lags the eviction watermark by one micro-batch
    (StateStoreSaveExec carries eventTimeWatermarkForLateEvents /
    ForEviction separately), so the drop takes effect from the third batch
    on: the earliest third must contribute nothing to the aggregate."""
    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "event_type", "value"
    )
    rows = ev.orderBy("ts").collect()
    third = len(rows) // 3
    early, mid, late = rows[:third], rows[third : 2 * third], rows[2 * third :]

    feed = tmp_path / "feed"
    feed.mkdir()
    parts = [
        (str(feed / "f1_late"), late, 200),
        (str(feed / "f2_mid"), mid, 100),
        (str(feed / "f3_early"), early, 0),
    ]
    now = time.time()
    for path, part, age in parts:
        spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(path)
        # FileStreamSource picks files oldest-mtime-first: age them so the
        # latest data forms micro-batch 0 and the earliest micro-batch 2.
        for fn in os.listdir(path):
            os.utime(os.path.join(path, fn), (now - age, now - age))

    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(feed))
    )
    agg = (
        sdf.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "cnt")
    )
    qname = "wm_late_test"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = {r["win_start"]: r["cnt"] for r in spark.table(qname).collect()}

    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    early_max_ts = max(r["ts"] for r in early)
    assert result, "no windows emitted"
    assert all(ws > early_max_ts for ws in result), (
        f"late-arriving early-third windows leaked past the watermark: "
        f"{sorted(result)[:3]} vs early_max_ts={early_max_ts}"
    )
    assert dropped > 0, "watermark never dropped anything"
    # Everything emitted comes from the mid+late thirds only.
    assert 0 < sum(result.values()) <= len(mid) + len(late)


def test_stream_dedup_is_distinct_keyset(spark, sf_dir):
    got = {
        (r["user_id"], r["event_type"])
        for r in _Q["stream_dedup"].fn(spark, sf_dir).collect()
    }
    want = {
        (r["user_id"], r["event_type"])
        for r in table(spark, sf_dir, "events").select("user_id", "event_type").distinct().collect()
    }
    assert got == want
