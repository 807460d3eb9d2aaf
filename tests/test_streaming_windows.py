"""Streaming-native operators: event-time tumbling windows with
watermarks, session windows, and stateful dedup within watermark —
driven synchronously with availableNow + memory sink."""

from __future__ import annotations

import pyspark.sql.functions as F

from bear_spark.events import change_events
from bear_spark.schema import CHANGE_EVENT_SCHEMA


def _write_log(spark, tmp_path, n=4000, seed=5):
    ev = change_events(spark, n, n_convs=30, seed=seed)
    path = str(tmp_path / "log")
    ev.write.mode("overwrite").parquet(path)
    return ev, path


def _run_stream(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_tumbling_window_with_watermark(spark, tmp_path):
    ev, path = _write_log(spark, tmp_path)
    stream = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(path)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _run_stream(agg, "tumbling_out")
    got = spark.sql("SELECT role, sum(n) AS n FROM tumbling_out GROUP BY role").toPandas()
    exp = ev.groupBy("role").agg(F.count(F.lit(1)).alias("n")).toPandas()
    g = dict(zip(got["role"], got["n"]))
    e = dict(zip(exp["role"], exp["n"]))
    # append mode emits only windows closed by the watermark; every window
    # before (max_ts - 1h) must be finalized, so allow the tail to differ
    assert all(g.get(k, 0) <= v for k, v in e.items())
    assert sum(g.values()) >= 0.9 * sum(e.values())


def test_session_window_stream(spark, tmp_path):
    ev, path = _write_log(spark, tmp_path, n=2000, seed=9)
    stream = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(path)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _run_stream(agg, "session_out")
    out = spark.sql("SELECT count(*) AS c, sum(n) AS total FROM session_out").collect()[0]
    assert out["c"] > 0
    assert out["total"] <= 2000


def test_stateful_conversation_progress(spark, tmp_path):
    from bear_spark.streaming.stateful import conversation_progress

    ev, path = _write_log(spark, tmp_path, n=3000, seed=21)
    stream = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(path)
    prog = conversation_progress(stream, watermark="1 hour", idle_timeout_ms=30 * 60 * 1000)
    _run_stream(prog, "progress_out")
    out = spark.sql(
        "SELECT conv_id, max(turns) AS turns, max(total_chars) AS chars, "
        "bool_or(closed) AS any_closed FROM progress_out GROUP BY conv_id"
    ).toPandas()
    exp = (
        ev.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("turns"), F.sum(F.length("text")).alias("chars"))
        .toPandas()
    )
    got = out.set_index("conv_id")
    want = exp.set_index("conv_id")
    assert set(got.index) == set(want.index)
    # cumulative counters must equal the full per-conversation totals
    merged = got.join(want, lsuffix="_g", rsuffix="_w")
    assert (merged["turns_g"] == merged["turns_w"]).all()
    assert (merged["chars_g"] == merged["chars_w"]).all()
    # idle conversations beyond the watermark horizon get finalized
    assert out["any_closed"].any()


def test_drop_duplicates_within_watermark(spark, tmp_path):
    ev, path = _write_log(spark, tmp_path, n=3000, seed=13)
    stream = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(path)
    dedup = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
    _run_stream(dedup, "dedup_out")
    got = spark.sql("SELECT count(*) AS c FROM dedup_out").collect()[0]["c"]
    distinct_keys = ev.select("conv_id", "turn_idx").distinct().count()
    assert distinct_keys <= got <= 3000
    # within any watermark horizon a key appears at most once per horizon;
    # with heavy duplication the stream must drop a large share
    assert got < 3000
