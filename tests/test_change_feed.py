"""Change-data-feed reads: LakeTable.changes(v_from, v_to) must emit the
NET row-level delta between two retained snapshots — the incremental-
consumer surface (Iceberg changelog scan / Delta CDF analog).

Covers: insert/update/delete classification, net-effect semantics
(insert+delete inside the range cancels), preimage rows, compaction-only
ranges emitting nothing (and pruning untouched buckets), and a range
spanning a schema evolution yielding the feed in the evolved schema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bear_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _events(spark, rows):
    """rows: (conv_id, turn_idx, text, ts_str, op, lsn)."""
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts string, op string, lsn long"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=4,
    )


def _feed(tbl, v_from, v_to=None, **kw):
    rows = tbl.changes(v_from, v_to, **kw).collect()
    return {
        (r["conv_id"], r["turn_idx"], r["_change_type"]): r["text"] for r in rows
    }


def test_changes_classifies_insert_update_delete(spark, table):
    table.merge(
        _events(
            spark,
            [
                ("a", 0, "a0", "2024-01-01 00:00:00", "I", 1),
                ("a", 1, "a1", "2024-01-01 00:00:01", "I", 2),
                ("b", 0, "b0", "2024-01-01 00:00:02", "I", 3),
            ],
        )
    )
    v1 = table.snapshot["version"]
    table.merge(
        _events(
            spark,
            [
                ("a", 1, "a1-new", "2024-01-02 00:00:00", "U", 4),  # update
                ("b", 0, None, "2024-01-02 00:00:01", "D", 5),  # delete
                ("c", 0, "c0", "2024-01-02 00:00:02", "I", 6),  # insert
            ],
        )
    )
    feed = _feed(table, v1)
    assert feed == {
        ("a", 1, "update_postimage"): "a1-new",
        ("b", 0, "delete"): "b0",  # delete carries last-seen payload
        ("c", 0, "insert"): "c0",
    }
    # ('a', 0) untouched -> absent from the feed
    pre = _feed(table, v1, include_preimage=True)
    assert pre[("a", 1, "update_preimage")] == "a1"
    assert len(pre) == 4


def test_changes_is_net_effect_across_commits(spark, table):
    v0 = table.snapshot["version"]
    table.merge(_events(spark, [("x", 0, "x0", "2024-01-01 00:00:00", "I", 1)]))
    table.merge(_events(spark, [("x", 0, None, "2024-01-02 00:00:00", "D", 2)]))
    table.merge(_events(spark, [("y", 0, "y0", "2024-01-03 00:00:00", "I", 3)]))
    feed = _feed(table, v0)
    # x was inserted then deleted inside the range: net nothing
    assert feed == {("y", 0, "insert"): "y0"}


def test_compaction_only_range_emits_nothing(spark, table):
    # distinct conv_ids in separate commits: disjoint key ranges stack up
    # as separate files in their buckets (range-pruned COW never rewrites
    # a file the batch cannot touch), leaving fragments to compact
    for i in range(8):
        table.merge(
            _events(spark, [(f"k{i}", 0, f"t{i}", f"2024-01-01 00:00:0{i}", "I", i + 1)])
        )
    v = table.snapshot["version"]
    out = table.compact(target_files_per_bucket=1)
    assert out["buckets_compacted"] >= 1
    df = table.changes(v)
    assert df.count() == 0


def test_changes_prunes_untouched_buckets(spark, table):
    table.merge(
        _events(
            spark,
            [(f"c{i}", 0, f"t{i}", "2024-01-01 00:00:00", "I", i + 1) for i in range(40)],
        )
    )
    v = table.snapshot["version"]
    table.merge(_events(spark, [("c1", 0, "t1-new", "2024-01-02 00:00:00", "U", 100)]))
    snap_from = table._snapshot(v)
    snap_to = table._snapshot()
    changed = table._changed_buckets(snap_from, snap_to)
    # only the bucket 'c1' hashes into was touched
    assert len(changed) == 1
    feed = _feed(table, v)
    assert feed == {("c1", 0, "update_postimage"): "t1-new"}


def test_changes_across_schema_evolution_uses_evolved_schema(spark, table):
    table.merge(_events(spark, [("a", 0, "a0", "2024-01-01 00:00:00", "I", 1)]))
    v = table.snapshot["version"]
    widened = (
        _events(spark, [("a", 1, "a1", "2024-01-02 00:00:00", "I", 2)])
        .withColumn("tool", F.lit("search"))
    )
    table.merge(widened)
    df = table.changes(v)
    assert "tool" in df.columns
    rows = {r["turn_idx"]: r for r in df.collect()}
    assert rows[1]["tool"] == "search" and rows[1]["_change_type"] == "insert"
    assert 0 not in rows  # old row unchanged, not re-emitted as a change


def test_changes_rejects_inverted_range(spark, table):
    table.merge(_events(spark, [("a", 0, "a0", "2024-01-01 00:00:00", "I", 1)]))
    v = table.snapshot["version"]
    with pytest.raises(ValueError):
        table.changes(v, 0)
