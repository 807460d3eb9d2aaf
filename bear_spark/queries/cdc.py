"""CDC-semantics queries over the driver's `events` table — the
SQL-checkable faces of the engine core (the full lake/streaming engine
is exercised in tests/, where DuckDB can't follow)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bear_spark.queries import query, t


@query(
    "lww_dedup_events",
    """
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def lww_dedup_events(spark, sf_dir):
    """FLAGSHIP: last-writer-wins dedup — keep, per (user_id,
    event_type), the event with max (ts, event_id). The exact shape the
    north rule mandates for (conv_id, turn_idx)/(ts, lsn)
    (reference analog: Milvus PK upsert keeps last write,
    reference: bear/db.py:72-83)."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value"))
    )


@query(
    "cdc_final_state",
    """
    SELECT user_id, event_type, ts, round(value, 2) AS value
    FROM (
      SELECT user_id, event_type, ts, value,
             CASE WHEN event_id % 10 = 0 THEN 'D'
                  WHEN event_id % 10 < 4 THEN 'U' ELSE 'I' END AS op,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_final_state(spark, sf_dir):
    """Full CDC replay semantics as one query: derive I/U/D ops
    deterministically from the log, LWW per key, drop keys whose winner
    is a delete (tombstone semantics of the lake table)."""
    e = t(spark, sf_dir, "events")
    withop = e.withColumn(
        "op",
        F.when(F.col("event_id") % 10 == 0, "D")
        .when(F.col("event_id") % 10 < 4, "U")
        .otherwise("I"),
    )
    w = W.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        withop.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", "event_type", "ts", F.round("value", 2).alias("value"))
    )


@query(
    "expr_formula_score",
    """
    SELECT event_id,
           round(pow(value, 3) / 1000 + log10(abs(value) + 3), 4) AS score
    FROM events WHERE event_type IN ('click', 'purchase') AND value > 5
    """,
)
def expr_formula_score(spark, sf_dir):
    """User-supplied arithmetic formula evaluated by Catalyst codegen —
    the vectorized-numexpr analog (reference: bear/reranker.py:97-103,
    allowed fns log10/sqrt at :101)."""
    e = t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").isin("click", "purchase") & (F.col("value") > 5))
        .select(
            "event_id",
            F.round(F.expr("pow(value, 3) / 1000 + log10(abs(value) + 3)"), 4).alias("score"),
        )
    )


@query(
    "json_extract_props",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events WHERE event_type = 'click'
    """,
)
def json_extract_props(spark, sf_dir):
    """JSON-path extraction from a string payload column (the
    reference's raw-API-JSON parsing shape, bear/model.py:173-202)."""
    e = t(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "click").select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


@query(
    "late_events_beyond_watermark",
    """
    WITH maxts AS (SELECT max(ts) AS m FROM events)
    SELECT user_id, count(*) AS n_late
    FROM events, maxts
    WHERE ts < m - INTERVAL 7 DAY AND event_id > (SELECT max(event_id) FROM events) * 0.9
    GROUP BY user_id
    """,
)
def late_events_beyond_watermark(spark, sf_dir):
    """Watermark-lateness accounting: events arriving in the last 10% of
    the log whose event time is > 7 days behind the max — the lineage
    metric the north rule requires."""
    e = t(spark, sf_dir, "events")
    mx = e.agg(
        F.max("ts").alias("m"), F.max("event_id").alias("me")
    )
    return (
        e.join(F.broadcast(mx))
        .filter(
            (F.col("ts") < F.col("m") - F.expr("INTERVAL 7 DAY"))
            & (F.col("event_id") > F.col("me") * 0.9)
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


@query(
    "conversation_stats",
    """
    SELECT conv_id, count(*) AS turns, max(turn_idx) AS max_turn_idx,
           -- DuckDB sum() of an integer is HUGEINT; the driver hashes raw
           -- values, so cast to match Spark's BIGINT bit-for-bit
           CAST(sum(length(text)) AS BIGINT) AS total_chars, max(ts) AS last_ts
    FROM (
      SELECT CAST(user_id AS VARCHAR) AS conv_id,
             CAST(event_id % 50 AS INT) AS turn_idx,
             event_type AS text, ts
      FROM events
    ) GROUP BY conv_id
    """,
)
def conversation_stats(spark, sf_dir):
    """Batch twin of the stateful streaming operator
    (streaming/stateful.conversation_progress): final per-conversation
    counters, oracle-checked. The events table stands in as the
    transcript stream (user_id -> conv, event_type -> text)."""
    e = t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.col("event_id") % 50).cast("int").alias("turn_idx"),
        F.col("event_type").alias("text"),
        "ts",
    )
    return e.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.sum(F.length("text")).alias("total_chars"),
        F.max("ts").alias("last_ts"),
    )
