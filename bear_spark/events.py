"""Deterministic synthetic change-event generator (the WAL/binlog tail).

Plays the role of the reference's cursor-paginated crawler
(reference: bear/crawler.py:124-177): an ordered, shard-partitioned
stream of raw change records. Fully Spark-native — ``spark.range`` +
hash-derived columns, no driver-side loops — so generating 10^8+ events
is a single distributed job. Seeded and wall-clock-free: the same
(n_events, seed) always produces the identical log.

Skew is generated on purpose: a configurable fraction of events lands on
a handful of hot conv_ids, exercising the skew-handling path the north
rule requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: default epoch for generated timestamps (UTC) — fixed, never wall-clock
DEFAULT_START = "2024-01-01 00:00:00"


def _h(col, seed: int):
    """Stable 64-bit hash stream keyed by a seed constant."""
    return F.abs(F.xxhash64(col, F.lit(seed)))


def change_events(
    spark: SparkSession,
    n_events: int,
    n_convs: int | None = None,
    turns_per_conv: int = 50,
    n_source_partitions: int = 8,
    seed: int = 42,
    hot_key_pct: int = 20,
    n_hot_keys: int = 4,
    delete_pct: int = 8,
    time_range_sec: int = 30 * 24 * 3600,
    disorder_sec: int = 2 * 3600,
    start_ts: str = DEFAULT_START,
    parallelism: int | None = None,
    start: int = 0,
    total_events: int | None = None,
) -> DataFrame:
    """Emit ``n_events`` change events in the ``CHANGE_EVENT_SCHEMA`` shape.

    ``start``/``total_events`` carve a contiguous slice out of a larger
    log: ``change_events(n, start=k*n, total_events=N)`` for k = 0..N/n
    yields exactly the same events as one ``change_events(N)`` call —
    soak/replay harnesses generate batch-by-batch without staging the
    whole log. (``total_events`` keeps the derived conv-id space and
    the event-time slope identical across slices.)

    - ``lsn``: the range id — globally unique, monotone.
    - ``ts``: loosely correlated with lsn (log position tracks event
      time, as a real WAL does) plus a bounded ± jitter
      (``disorder_sec``) so a realistic share of events is out of
      order / late; LWW must still converge.
    - ``source_partition/offset``: round-robin sharding of the log;
      offsets are contiguous per shard (lsn = offset * P + shard).
    - ``hot_key_pct`` % of events collapse onto ``n_hot_keys`` conv_ids.
    """
    total = total_events if total_events is not None else start + n_events
    if n_convs is None:
        n_convs = max(10, total // (3 * turns_per_conv))
    df = spark.range(
        start, start + n_events, 1, parallelism or spark.sparkContext.defaultParallelism
    )
    i = F.col("id")

    conv_idx = F.when(
        _h(i, seed) % 100 < hot_key_pct, _h(i, seed + 1) % n_hot_keys
    ).otherwise(n_hot_keys + _h(i, seed + 2) % n_convs)
    turn = (_h(i, seed + 3) % turns_per_conv).cast("int")
    opsel = _h(i, seed + 4) % 100
    role_arr = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("system"))
    tool_arr = F.array(F.lit("bash"), F.lit("search"), F.lit("browser"), F.lit("editor"))

    out = df.select(
        F.format_string("conv_%08d", conv_idx).alias("conv_id"),
        turn.alias("turn_idx"),
        F.element_at(role_arr, (_h(i, seed + 5) % 4 + 1).cast("int")).alias("role"),
        # text is a pure function of (conv, turn, lsn): the replay oracle
        # recomputes it independently, giving per-turn text equality checks.
        F.format_string(
            "turn conv=%d t=%d v=%d :: %s",
            conv_idx,
            turn,
            i,
            F.repeat(F.format_string("w%d ", _h(i, seed + 6) % 997), (_h(i, seed + 7) % 12 + 1).cast("int")),
        ).alias("text"),
        F.when(
            _h(i, seed + 5) % 4 == 2,
            F.element_at(tool_arr, (_h(i, seed + 8) % 4 + 1).cast("int")),
        ).alias("tool"),
        (
            F.to_timestamp(F.lit(start_ts))
            + F.make_dt_interval(
                F.lit(0),
                F.lit(0),
                F.lit(0),
                # event time tracks log position, ± bounded disorder
                (
                    i * F.lit(time_range_sec) / F.lit(max(1, total))
                    + (_h(i, seed + 9) % (2 * disorder_sec)).cast("double")
                    - F.lit(disorder_sec)
                ).cast("double"),
            )
        ).alias("ts"),
        F.when(opsel < delete_pct, F.lit("D"))
        .when(opsel < delete_pct + 40, F.lit("U"))
        .otherwise(F.lit("I"))
        .alias("op"),
        i.alias("lsn"),
        (i % n_source_partitions).cast("int").alias("source_partition"),
        (i / n_source_partitions).cast("long").alias("offset"),
    )
    return out
