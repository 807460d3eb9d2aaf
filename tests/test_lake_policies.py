"""Merge-policy edges: late-event admission (drop_late) vs tombstone
expiry, bucket-hash stability across arrival types, and Arrow-kernel
type coverage with SQL fallback for nested payloads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bear_spark.lake import LakeTable
from bear_spark.lake.arrow_apply import supports_schema
from bear_spark.schema import schema_to_json

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


@pytest.mark.parametrize("mode", ["arrow", "sql"])
def test_drop_late_table_survives_expiry_without_resurrection(spark, tmp_path, mode):
    """On a drop_late table the watermark is a hard admission boundary,
    so expire_tombstones (watermark default) can never be beaten by a
    late stale update."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / f"tbl_{mode}"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=2,
        lateness_sec=0,
        drop_late=True,
    )
    tbl.merge(_events(spark, [("c1", 0, "hello", "2024-01-10 00:00:00", "I", 1)]), mode=mode)
    m = tbl.merge(_events(spark, [("c1", 0, None, "2024-01-11 00:00:00", "D", 2)]), mode=mode)
    assert m["tombstones"] == 1
    assert tbl.read().count() == 0
    # push the watermark strictly past the delete's event time (a
    # tombstone AT the watermark is still live — an equal-ts event with
    # a higher lsn remains admissible)
    tbl.merge(_events(spark, [("c9", 0, "advance wm", "2024-01-12 00:00:00", "I", 10)]), mode=mode)

    out = tbl.expire_tombstones()  # watermark default is allowed here
    assert out["expired"] == 1

    # a late, stale update (ts below the 2024-01-11 watermark) arrives:
    # it must be counted AND dropped, never resurrecting the deleted key
    m = tbl.merge(
        _events(spark, [("c1", 0, "stale resurrect", "2024-01-05 00:00:00", "U", 3)]),
        mode=mode,
    )
    assert m["late_events"] == 1
    assert m["late_dropped"] == 1
    assert tbl.read().filter(F.col("conv_id") == "c1").count() == 0


def test_keep_late_table_requires_explicit_expiry_cutoff(spark, tmp_path):
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=2,
        lateness_sec=0,
    )
    tbl.merge(_events(spark, [("c1", 0, None, "2024-01-11 00:00:00", "D", 1)]))
    with pytest.raises(ValueError, match="drop_late"):
        tbl.expire_tombstones()
    out = tbl.expire_tombstones(older_than="2024-02-01 00:00:00")
    assert out["expired"] == 1


def test_keep_late_table_applies_late_events(spark, tmp_path):
    """Default policy: late events still apply (full-history replay
    convergence) — only counted as late, never dropped."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=2,
        lateness_sec=0,
    )
    tbl.merge(_events(spark, [("c1", 0, "first", "2024-01-10 00:00:00", "I", 1)]))
    m = tbl.merge(_events(spark, [("c2", 0, "late insert", "2024-01-01 00:00:00", "I", 2)]))
    assert m["late_events"] == 1 and m["late_dropped"] == 0
    assert tbl.read().count() == 2


@pytest.mark.parametrize("mode", ["arrow", "sql"])
def test_bucket_hash_stable_when_key_arrives_narrower(spark, tmp_path, mode):
    """xxhash64 is type-sensitive: a batch whose bucket column arrives
    as int while the table stores long must still route each key to the
    same bucket (else LWW dedup splits across buckets)."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tbl = LakeTable.create(
        spark,
        str(tmp_path / f"tbl_{mode}"),
        schema,
        key_cols=["k"],
        seq_col="ts",
        num_buckets=8,
    )
    base = spark.range(50).select(
        F.col("id").alias("k"),
        F.lit("v1").alias("text"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
    )
    tbl.merge(base, mode=mode)
    # same keys, narrower arrival type, newer ts
    upd = spark.range(50).select(
        F.col("id").cast("int").alias("k"),
        F.lit("v2").alias("text"),
        F.lit("2024-01-02 00:00:00").cast("timestamp").alias("ts"),
        F.lit("U").alias("op"),
        (F.col("id") + 100).alias("lsn"),
    )
    tbl.merge(upd, mode=mode)
    got = tbl.read().toPandas()
    assert len(got) == 50, "duplicate keys across buckets — hash routed by arrival type"
    assert set(got["text"]) == {"v2"}
    # point lookup probes with the payload-schema type → same bucket
    assert tbl.lookup(7).toPandas()["text"].tolist() == ["v2"]


def test_bucket_column_type_widening_rejected(spark, tmp_path):
    from bear_spark.lake.reconcile import SchemaConflict

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tbl = LakeTable.create(
        spark, str(tmp_path / "tbl"), schema, key_cols=["k"], seq_col="ts", num_buckets=2
    )
    wide = spark.range(3).select(
        F.col("id").alias("k"),  # long > table's int → would re-bucket
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
    )
    with pytest.raises(SchemaConflict, match="bucket column"):
        tbl.merge(wide)


def test_array_payload_falls_back_to_sql_on_default_merge(spark, tmp_path):
    """An embedding array<double> payload can't take the Arrow kernel
    (no hash-last kernel for lists) — the default merge must silently
    use the SQL path instead of raising."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("emb", T.ArrayType(T.DoubleType())),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    assert not supports_schema(schema_to_json(schema))
    tbl = LakeTable.create(
        spark, str(tmp_path / "tbl"), schema, key_cols=["doc_id"], seq_col="ts", num_buckets=2
    )
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.array(F.col("id").cast("double"), F.lit(0.5)).alias("emb"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
    )
    m = tbl.merge(df)  # default mode=arrow → auto-fallback
    assert m["rows_written"] == 10
    got = tbl.read().toPandas().sort_values("doc_id")
    assert got["emb"].iloc[3][0] == 3.0


def test_merge_carries_over_range_pruned_files(spark, tmp_path):
    """A merge must not rewrite files whose key range the batch cannot
    touch: they survive byte-identical under the same path (snapshot
    re-reference), so task memory is bounded by touched files, not the
    whole bucket."""
    import hashlib
    import os

    def rows(prefix, text, lsn0, ts):
        return [
            (f"{prefix}{i:02d}", 0, text, ts, "I" if text == "v1" else "U", lsn0 + i)
            for i in range(50)
        ]

    tbl = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=1,  # one bucket → pruning, not bucketing, must save us
    )
    tbl.merge(_events(spark, rows("a", "v1", 0, "2024-01-01 00:00:00")), mode="arrow")
    snap1 = tbl.snapshot
    afile = snap1["files"]["0"][0]
    assert afile["kmin"] == "a00" and afile["kmax"] == "a49"
    apath = os.path.join(tbl.root, afile["path"])
    digest1 = hashlib.md5(open(apath, "rb").read()).hexdigest()

    # disjoint key range: the a-file must be carried over untouched
    m = tbl.merge(_events(spark, rows("m", "v1", 100, "2024-01-02 00:00:00")), mode="arrow")
    assert m["target_rows_read"] == 0, "a-file was read despite disjoint range"
    snap2 = tbl.snapshot
    paths2 = [fi["path"] for fi in snap2["files"]["0"]]
    assert afile["path"] in paths2 and len(paths2) == 2

    # touch one m-key: m-file rewritten, a-file carried again
    m = tbl.merge(
        _events(spark, [("m10", 0, "v2", "2024-01-03 00:00:00", "U", 200)]), mode="arrow"
    )
    assert m["target_rows_read"] == 50, "only the m-file should be read"
    snap3 = tbl.snapshot
    paths3 = [fi["path"] for fi in snap3["files"]["0"]]
    assert afile["path"] in paths3 and len(paths3) == 2
    assert hashlib.md5(open(apath, "rb").read()).hexdigest() == digest1

    got = tbl.read().toPandas()
    assert len(got) == 100
    assert got.set_index("conv_id")["text"]["m10"] == "v2"
    assert set(got[got["conv_id"].str.startswith("a")]["text"]) == {"v1"}
    # vacuum must keep every stage dir a carried file lives in
    tbl.vacuum()
    assert os.path.exists(apath)
    assert tbl.read().count() == 100


def test_binary_payload_supported_by_arrow_kernel(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    assert supports_schema(schema_to_json(schema))
    tbl = LakeTable.create(
        spark, str(tmp_path / "tbl"), schema, key_cols=["doc_id"], seq_col="ts", num_buckets=2
    )
    df = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.encode(F.concat(F.lit("blob-"), F.col("id").cast("string")), "utf-8").alias("payload"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
    )
    tbl.merge(df, mode="arrow")
    got = tbl.read().toPandas().sort_values("doc_id")
    assert bytes(got["payload"].iloc[2]) == b"blob-2"


def test_commit_metadata_is_per_touched_bucket(spark, tmp_path):
    """Sharded snapshot metadata: a merge touching one bucket writes one
    new manifest document, carries every other bucket's manifest by
    reference, and the snapshot document itself stores only pointers."""
    import glob
    import json
    import os

    tbl = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=8,
    )
    # seed every bucket
    seed = [
        (f"conv_{i:03d}", t, f"v1-{i}-{t}", "2024-01-01 00:00:00", "I", i * 10 + t)
        for i in range(40)
        for t in range(2)
    ]
    tbl.merge(_events(spark, seed))
    snap1 = tbl._snapshot()
    assert "files" not in snap1 and len(snap1["manifests"]) == 8
    mdir = os.path.join(tbl.root, "_meta", "manifests")
    n_manifests_v1 = len(glob.glob(os.path.join(mdir, "*.json")))

    # touch exactly one key → one bucket
    tbl.merge(_events(spark, [("conv_000", 0, "v2", "2024-01-02 00:00:00", "U", 999)]))
    snap2 = tbl._snapshot()
    new_manifests = glob.glob(os.path.join(mdir, f"m{snap2['version']:08d}-*.json"))
    assert len(new_manifests) == 1, "only the touched bucket gets a new manifest"
    carried = set(snap1["manifests"].items()) & set(snap2["manifests"].items())
    assert len(carried) == 7, "untouched buckets carry their manifest pointers"
    # the snapshot document holds pointers, not the file inventory
    raw = json.load(open(os.path.join(tbl.root, "_meta", f"v{snap2['version']}.json")))
    assert "files" not in raw
    assert all(isinstance(v, str) for v in raw["manifests"].values())

    # hydrated view still serves the full inventory; reads are intact
    assert sum(len(v) for v in tbl.snapshot["files"].values()) >= 8
    got = tbl.read().toPandas()
    assert len(got) == 80
    assert got.set_index(["conv_id", "turn_idx"])["text"]["conv_000", 0] == "v2"

    # vacuum drops manifests no longer referenced, keeps the live ones
    tbl.vacuum()
    left = {os.path.basename(p) for p in glob.glob(os.path.join(mdir, "*.json"))}
    assert left == {os.path.basename(r) for r in snap2["manifests"].values()}
    assert len(left) <= n_manifests_v1 + 1
    assert tbl.read().count() == 80


def test_merge_splits_output_files_at_target_rows(spark, tmp_path):
    """A batch touching a bucket's whole key range must not emit one
    unbounded replacement file: output is chunked at target_file_rows,
    each chunk key-sorted with its own tight manifest [kmin, kmax]."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=1,
    )
    rows = [
        (f"conv_{i:04d}", 0, f"t{i}", "2024-01-01 00:00:00", "I", i)
        for i in range(250)
    ]
    m = tbl.merge(_events(spark, rows), target_file_rows=100)
    assert m["rows_written"] == 250
    files = tbl.snapshot["files"]["0"]
    live = [fi for fi in files if not fi["deleted"]]
    assert len(live) == 3, [fi["path"] for fi in live]
    assert [fi["rows"] for fi in live] == [100, 100, 50]
    # chunks are key-sorted and non-overlapping → range pruning works
    ranges = sorted((fi["kmin"], fi["kmax"]) for fi in live)
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    assert tbl.read().count() == 250
    # a later single-key update must touch exactly one chunk (the other
    # two carried over by range pruning)
    m2 = tbl.merge(
        _events(spark, [("conv_0000", 0, "v2", "2024-01-02 00:00:00", "U", 9999)]),
        target_file_rows=100,
    )
    assert m2["target_rows_read"] == 100, "only the covering chunk is rewritten"
    assert tbl.read().filter(F.col("conv_id") == "conv_0000").first()["text"] == "v2"


def test_compact_honors_target_and_skips_unfragmented(spark, tmp_path):
    """compact(target_files_per_bucket=N) rewrites ONLY buckets with
    more than N files per side and carries the rest by pointer; a fully
    compacted table is a metadata no-op."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=4,
    )
    # seed all buckets, then fragment them with chunked writes
    rows = [
        (f"conv_{i:04d}", 0, f"t{i}", "2024-01-01 00:00:00", "I", i)
        for i in range(200)
    ]
    tbl.merge(_events(spark, rows), target_file_rows=20)
    snap1 = tbl._snapshot()
    frag_counts = {b: len(fs) for b, fs in tbl._files(snap1).items()}
    assert all(c > 2 for c in frag_counts.values()), frag_counts

    out = tbl.compact(target_files_per_bucket=2)
    assert out["buckets_compacted"] == 4
    snap2 = tbl._snapshot()
    assert all(len(fs) <= 2 for fs in tbl._files(snap2).values())
    assert tbl.read().count() == 200

    # second compaction: nothing fragmented → no new snapshot version
    out2 = tbl.compact(target_files_per_bucket=2)
    assert out2["buckets_compacted"] == 0
    assert tbl._snapshot()["version"] == snap2["version"]

    # partial fragmentation: touch ~one bucket with chunked output, then
    # compact — untouched buckets must carry their manifest pointers
    tbl.merge(
        _events(
            spark,
            [("conv_0000", t, "x", "2024-01-03 00:00:00", "U", 10_000 + t) for t in range(1)],
        ),
    )
    snap3 = tbl._snapshot()
    touched = {
        b for b in snap3["manifests"]
        if snap3["manifests"][b] != snap2["manifests"].get(b)
    }
    tbl.compact(target_files_per_bucket=1)
    snap4 = tbl._snapshot()
    untouched = set(snap3["manifests"]) - touched
    carried = {b for b in untouched if snap4["manifests"][b] == snap3["manifests"][b]}
    assert carried == untouched, "unfragmented buckets must not be rewritten"
    assert tbl.read().count() == 200


def test_adaptive_precombine_engages_on_persistent_hot_key(spark, tmp_path, monkeypatch):
    """Extreme skew: one conv_id dominating the batch auto-enables the
    map-side LWW pre-combine on the NEXT batch (feedback from the
    lineage skew stat), with identical convergence either way."""
    monkeypatch.delenv("BEAR_MERGE_PRECOMBINE", raising=False)
    monkeypatch.setenv("BEAR_PRECOMBINE_MIN_ROWS", "1000")  # test-sized
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=4,
    )
    hot = [
        ("conv_hot", 0, f"v{i}", f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}", "U", i)
        for i in range(1500)
    ] + [
        (f"conv_{i:03d}", 0, "cold", "2024-01-01 00:00:00", "I", 10_000 + i)
        for i in range(100)
    ]
    m1 = tbl.merge(_events(spark, hot))
    assert m1["max_key_rows"] == 1500
    assert m1["max_key_share"] > 0.9
    assert m1["precombine"] is False, "first batch has no lineage to react to"

    m2 = tbl.merge(
        _events(
            spark,
            [
                ("conv_hot", 0, f"w{i}", f"2024-01-02 00:{i // 60:02d}:{i % 60:02d}", "U", 50_000 + i)
                for i in range(1200)
            ],
        )
    )
    assert m2["precombine"] is True, "persistent hot key must auto-enable pre-combine"
    # convergence: LWW winner is the max-(ts, lsn) event of batch 2
    final = tbl.read().filter(F.col("conv_id") == "conv_hot").toPandas()
    assert len(final) == 1 and final.iloc[0]["text"] == "w1199"
    assert tbl.read().count() == 101

    # forcing it off wins over the adaptive signal
    m3 = tbl.merge(
        _events(spark, [("conv_hot", 0, "z", "2024-01-03 00:00:00", "U", 99_999)]),
        precombine=False,
    )
    assert m3["precombine"] is False
    assert tbl.read().filter(F.col("conv_id") == "conv_hot").first()["text"] == "z"


def test_untouched_rows_pass_through_lww_under_schema_evolution(spark, tmp_path):
    """Contended-row split: existing-file rows whose key is not in the
    batch bypass the (ts, lsn) sort + group-last and are appended
    directly to the key-sorted rewrite. They must still be aligned to
    the evolved schema (new columns null-filled), keep their tombstone
    flag, and survive a same-file partial update byte-equal in value."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=1,  # one bucket, one file: every key shares the file
    )
    seed = [
        (f"c{i:02d}", 0, f"v{i}", "2024-01-01 00:00:00", "I", i) for i in range(8)
    ]
    tbl.merge(_events(spark, seed), mode="arrow")
    # delete one key so the bucket also has a tombstone file whose rows
    # (except the contended one) must pass through unchanged
    tbl.merge(
        _events(spark, [("c03", 0, None, "2024-01-02 00:00:00", "D", 100)]),
        mode="arrow",
    )

    # evolved batch: adds a `tool` column, touches ONLY c01 — the other
    # seven keys (six live + one tombstone) ride the passthrough path
    ev = spark.createDataFrame(
        [("c01", 0, "v1b", "2024-01-03 00:00:00", "claude", "U", 200)],
        "conv_id string, turn_idx int, text string, ts string, tool string, "
        "op string, lsn long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    m = tbl.merge(ev, mode="arrow")
    assert m["schema_changes"], "tool column should evolve the schema"
    # work-reduction counters: only the batch row + the contended c01
    # row entered the LWW sort; the six other live rows rode the
    # passthrough (the c03 tombstone file's [c03, c03] key range does
    # not overlap the batch, so it was range-pruned and never read)
    assert m["lww_rows"] == 2
    assert m["passthrough_rows"] == 6

    got = tbl.read().orderBy("conv_id").toPandas()
    assert list(got["conv_id"]) == [f"c{i:02d}" for i in range(8) if i != 3]
    assert got.set_index("conv_id")["text"]["c01"] == "v1b"
    assert got.set_index("conv_id")["tool"]["c01"] == "claude"
    # passthrough rows: original values, evolved column null-filled
    untouched = got[got["conv_id"] != "c01"]
    assert untouched["tool"].isna().all()
    assert list(untouched["text"]) == [f"v{i}" for i in range(8) if i not in (1, 3)]
    # the tombstone passed through with its flag intact
    dead = (
        tbl.read(include_deleted=True, include_system=True)
        .filter("_deleted")
        .toPandas()
    )
    assert list(dead["conv_id"]) == ["c03"]


def test_orphan_stage_files_from_crashed_attempt_never_committed(spark, tmp_path):
    """A merge attempt that crashed after staging chunk files must not
    leak them into a later commit: stage dirs are per-ATTEMPT unique
    (data/s<version>-<token>), so a later merge at the same target
    version enumerates only its own files, and vacuum() reclaims the
    orphan directory."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "tbl")
    tbl = LakeTable.create(
        spark, root, SCHEMA, key_cols=["conv_id", "turn_idx"],
        seq_col="ts", num_buckets=1,
    )
    tbl.merge(_events(spark, [("c1", 0, "v1", "2024-01-01 00:00:00", "I", 1)]))

    # fabricate the wreckage of a crashed attempt at the NEXT version:
    # clone a real staged file's physical schema, poison its payload,
    # and drop it where a version-keyed (non-tokenized) stage layout
    # would have enumerated it
    src = glob.glob(os.path.join(root, "data", "s1-*", "_bucket_dir=0",
                                 "_del=false", "*.parquet"))[0]
    t = pq.read_table(src)
    poison = t.set_column(
        t.schema.get_field_index("text"), "text",
        pa.array(["POISON"] * t.num_rows, type=t.schema.field("text").type),
    )
    orphan_dir = os.path.join(root, "data", "s2-deadbeef",
                              "_bucket_dir=0", "_del=false")
    os.makedirs(orphan_dir)
    pq.write_table(poison, os.path.join(orphan_dir, "part-00000-c0099.parquet"))

    m = tbl.merge(_events(spark, [("c2", 0, "v2", "2024-01-02 00:00:00", "I", 2)]))
    assert not m.get("skipped")
    got = tbl.read().toPandas()
    assert sorted(got["text"]) == ["v1", "v2"], "orphan chunk leaked into commit"

    removed = tbl.vacuum()
    assert "s2-deadbeef" in removed
    assert sorted(tbl.read().toPandas()["text"]) == ["v1", "v2"]


def test_compact_preserves_target_file_rows_chunking(spark, tmp_path):
    """compact() must not merge legitimate target_file_rows chunks back
    into one unbounded file: a bucket whose file count is justified by
    ceil(rows / target_file_rows) is not fragmentation, and a genuinely
    fragmented bucket is rewritten into size-bounded files, not one."""
    tbl = LakeTable.create(
        spark, str(tmp_path / "tbl"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], seq_col="ts", num_buckets=1,
    )
    rows = [
        (f"conv_{i:04d}", 0, f"t{i}", "2024-01-01 00:00:00", "I", i)
        for i in range(250)
    ]
    tbl.merge(_events(spark, rows), target_file_rows=100)
    live = [fi for fi in tbl.snapshot["files"]["0"] if not fi["deleted"]]
    assert [fi["rows"] for fi in live] == [100, 100, 50]

    # 3 chunks for 250 rows at tfr=100 is the legitimate floor → no-op
    out = tbl.compact(target_files_per_bucket=1, target_file_rows=100)
    assert out["buckets_compacted"] == 0

    # now ACTUALLY fragment the bucket: five more 10-row merges
    for k in range(5):
        extra = [
            (f"x{k}_{j:02d}", 0, "pad", "2024-01-01 00:00:00", "I",
             1000 + k * 10 + j)
            for j in range(10)
        ]
        tbl.merge(_events(spark, extra), target_file_rows=100)
    live = [fi for fi in tbl.snapshot["files"]["0"] if not fi["deleted"]]
    assert len(live) > 3
    out = tbl.compact(target_files_per_bucket=1, target_file_rows=100)
    assert out["buckets_compacted"] == 1
    live = [fi for fi in tbl.snapshot["files"]["0"] if not fi["deleted"]]
    total = sum(fi["rows"] for fi in live)
    assert total == 300
    assert all(fi["rows"] <= 100 for fi in live), [fi["rows"] for fi in live]
    assert len(live) == 3
    assert tbl.read().count() == 300


def test_merge_partition_count_gives_parallelism_independent_waves(monkeypatch):
    """Task waves must not get coarser as cores grow: at 2x-cores
    shuffle-partition defaults, local[8] used to get 2 waves where
    local[2] got 4, turning bucket-size variance into a straggler tail
    on exactly the leg the N->4N scaling rule measures."""
    from bear_spark.lake.table import merge_partition_count

    monkeypatch.delenv("BEAR_MERGE_TASKS_PER_CORE", raising=False)
    # default (2 tasks/core) matches the banked-evidence task counts
    # wherever shuffle partitions track 2x cores
    assert merge_partition_count(64, 8, 2) == 8
    assert merge_partition_count(64, 16, 8) == 16
    # raising the knob equalizes wave count across parallelism levels
    monkeypatch.setenv("BEAR_MERGE_TASKS_PER_CORE", "4")
    assert merge_partition_count(64, 8, 2) == 8
    assert merge_partition_count(64, 16, 8) == 32
    # a bucket never splits across tasks: bucket count caps
    assert merge_partition_count(4, 16, 8) == 4
    assert merge_partition_count(64, 64, 32) == 64
    # never below one task; defensive on zero parallelism
    monkeypatch.delenv("BEAR_MERGE_TASKS_PER_CORE", raising=False)
    assert merge_partition_count(1, 8, 0) == 1


def test_sql_merge_splits_output_files_at_target_rows(spark, tmp_path):
    """mode='sql' honors the same target_file_rows contract as the
    arrow kernel: key-sorted chunks bounded by the knob, tight
    non-overlapping manifest ranges — not one unbounded file per
    bucket side."""
    tbl = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        seq_col="ts",
        num_buckets=1,
    )
    rows = [
        (f"conv_{i:04d}", 0, f"t{i}", "2024-01-01 00:00:00", "I", i)
        for i in range(250)
    ]
    m = tbl.merge(_events(spark, rows), mode="sql", target_file_rows=100)
    assert m["rows_written"] == 250
    live = [fi for fi in tbl.snapshot["files"]["0"] if not fi["deleted"]]
    assert len(live) == 3, [fi["rows"] for fi in live]
    assert sorted(fi["rows"] for fi in live) == [50, 100, 100]
    # chunks are key-sorted and non-overlapping -> range pruning works
    ranges = sorted((fi["kmin"], fi["kmax"]) for fi in live)
    for (_lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    assert tbl.read().count() == 250


def test_concurrent_commit_loser_leaves_winner_intact(spark, tmp_path):
    """Two merges racing from one base version: the winner commits, the
    loser raises ConcurrentCommit at the phase-2 snapshot swap with the
    winner's manifests and data untouched, and a retry of the loser
    (now reading the advanced snapshot) succeeds. The loser's orphaned
    stage dir is reclaimed by vacuum()."""
    from bear_spark.lake.table import ConcurrentCommit

    root = str(tmp_path / "tbl")
    t1 = LakeTable.create(
        spark, root, SCHEMA, key_cols=["conv_id", "turn_idx"],
        seq_col="ts", num_buckets=2,
    )
    t1.merge(_events(spark, [("base", 0, "baseline", "2024-01-01 00:00:00", "I", 1)]))

    # a second, independent writer handle over the same table root;
    # freeze its snapshot view at the CURRENT version so both writers
    # observe the same base — the deterministic stand-in for two
    # processes whose merge() calls interleave
    t2 = LakeTable.load(spark, root)
    stale = t2._snapshot()
    orig_snapshot = t2._snapshot
    t2._snapshot = lambda version=None: (  # type: ignore[method-assign]
        stale if version is None else orig_snapshot(version)
    )

    # winner commits v2 normally
    m1 = t1.merge(_events(spark, [("win", 0, "winner", "2024-01-02 00:00:00", "I", 2)]))
    assert m1["version"] == 2

    # loser stages against the stale base, must lose the optimistic check
    with pytest.raises(ConcurrentCommit):
        t2.merge(_events(spark, [("los", 0, "loser", "2024-01-03 00:00:00", "I", 3)]))

    # winner's commit is fully intact: version, manifests resolvable,
    # data readable, loser's row absent
    fresh = LakeTable.load(spark, root)
    assert fresh.snapshot["version"] == 2
    got = sorted(fresh.read().toPandas()["text"])
    assert got == ["baseline", "winner"]

    # retry of the loser against the live snapshot succeeds
    t2._snapshot = orig_snapshot  # type: ignore[method-assign]
    m2 = t2.merge(_events(spark, [("los", 0, "loser", "2024-01-03 00:00:00", "I", 3)]))
    assert m2["version"] == 3
    assert sorted(t2.read().toPandas()["text"]) == ["baseline", "loser", "winner"]

    # the failed attempt's stage dir (target version 2, unreferenced) is
    # orphaned garbage; vacuum reclaims it and the table is unchanged
    import glob
    import os

    orphans_before = [
        d for d in os.listdir(os.path.join(root, "data"))
        if d.startswith("s2-")
        and not any(
            fi["path"].split(os.sep)[1] == d
            for fs in t2._files(t2._snapshot()).values()
            for fi in fs
        )
    ]
    assert orphans_before, "expected the loser's stage dir to be orphaned"
    removed = t2.vacuum()
    assert set(orphans_before) <= set(removed)
    assert sorted(LakeTable.load(spark, root).read().toPandas()["text"]) == [
        "baseline", "loser", "winner",
    ]


def test_cdc_applier_retries_on_concurrent_commit(spark, tmp_path, monkeypatch):
    """A side maintenance job racing a micro-batch must not kill the
    stream: CDCApplier retries merge on ConcurrentCommit (bounded), and
    surfaces the retry count in the batch metrics. When the bound is
    exhausted the error propagates."""
    from bear_spark.lake.table import ConcurrentCommit
    from bear_spark.streaming.apply import CDCApplier

    tbl = LakeTable.create(
        spark, str(tmp_path / "tbl"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], seq_col="ts", num_buckets=2,
    )
    app = CDCApplier(
        spark, tbl,
        changelog_dir=str(tmp_path / "log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        metrics_dir=str(tmp_path / "metrics"),
        merge_retries=3,
    )

    real_merge = tbl.merge
    fail_first = {"left": 2}

    def flaky(batch, **kw):
        if fail_first["left"] > 0:
            fail_first["left"] -= 1
            raise ConcurrentCommit("maintenance advanced the snapshot")
        return real_merge(batch, **kw)

    monkeypatch.setattr(tbl, "merge", flaky)
    batch = _events(spark, [("c1", 0, "hello", "2024-01-01 00:00:00", "I", 1)])
    app._apply_batch(batch, epoch_id=0)
    assert app.batch_metrics[0]["merge_retries"] == 2
    assert tbl.read().count() == 1

    # exhausting the bound propagates the error (no infinite writer war)
    def always_lose(batch, **kw):
        raise ConcurrentCommit("stuck")

    monkeypatch.setattr(tbl, "merge", always_lose)
    with pytest.raises(ConcurrentCommit):
        app._apply_batch(batch, epoch_id=1)
