"""Durable ANN index state: build → probe = partition pruning.

The probe must (a) read ONLY the probed lists' files — checked with the
index's pruning receipt AND input_file_name() on the candidate scan —
and (b) return exactly what the scan-time expression operators return
for the same hash family and probe parameters. Staleness is a hard
error by default; refresh() reassigns without refitting.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bear_spark.lake import LakeTable, StaleVectorIndex, VectorIndex
from bear_spark.operators import similarity as S

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("ts", T.TimestampType()),
    ]
)

DIM = 16


def _vec_rows(n, seed=0, start_id=0):
    rng = np.random.default_rng(seed)
    return [
        (start_id + i, [float(x) for x in rng.standard_normal(DIM)],
         "2024-01-01 00:00:00", "I", start_id + i)
        for i in range(n)
    ]


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, ts string, op string, lsn long"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _mk_table(spark, tmp_path, n=200):
    tbl = LakeTable.create(
        spark, str(tmp_path / "tbl"), SCHEMA,
        key_cols=["vec_id"], seq_col="ts", num_buckets=2,
    )
    tbl.merge(_events(spark, _vec_rows(n)))
    return tbl


def _query_vec(seed=99):
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(DIM)]


def test_lsh_index_probe_prunes_files_and_matches_operator(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path)
    idx = tbl.build_vector_index("ann", kind="lsh", n_planes=4, seed=7)
    idx.debug_receipts = True  # files_total is an O(all lists) sweep
    q = _query_vec()

    got = idx.probe(q, k=10, max_probe_hamming=2).collect()

    # pruning receipt: strictly fewer files opened than the index holds
    pr = idx.last_probe
    assert pr["files_read"], "probe read no files"
    assert len(pr["files_read"]) < pr["files_total"], (
        "probe read every index file — no pruning happened"
    )
    # independent check: every file feeding the candidate scan lives in
    # a probed _list= directory
    lists = idx.probe_lists(q, max_probe_hamming=2)
    cand = idx._candidate_scan(lists)
    read_files = {
        r[0].replace("file://", "")
        for r in cand.select(F.input_file_name()).distinct().collect()
    }
    probed_dirs = tuple(pr["dirs"])
    assert read_files
    for f in read_files:
        assert f.startswith(probed_dirs), f"{f} outside probed dirs"

    # results identical to the scan-time expression operator (same hash
    # family: planes derive from (dim, n_planes, seed))
    exp = S.lsh_ann_topk(
        tbl.read(), q, k=10, n_planes=4, seed=7, max_probe_hamming=2
    ).collect()
    assert [(r.vec_id, r.cos_sim) for r in got] == [
        (r.vec_id, r.cos_sim) for r in exp
    ]


def test_ivf_index_probe_prunes_files_and_matches_operator(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path)
    idx = tbl.build_vector_index("ivf", kind="ivf", n_lists=8, seed=7)
    idx.debug_receipts = True
    q = _query_vec()

    got = idx.probe(q, k=10, n_probe=3).collect()

    pr = idx.last_probe
    assert pr["lists_probed"] and len(pr["lists_probed"]) == 3
    assert pr["files_read"] and len(pr["files_read"]) < pr["files_total"]

    # same centroids (persisted state) through the expression operator
    exp = S.ivf_ann_topk(
        tbl.read(), q, idx.meta["state"], k=10, n_probe=3
    ).collect()
    assert [(r.vec_id, r.cos_sim) for r in got] == [
        (r.vec_id, r.cos_sim) for r in exp
    ]


def test_stale_index_raises_and_refresh_recovers(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path, n=100)
    idx = tbl.build_vector_index("ann", kind="lsh", n_planes=3, seed=7)
    q = _query_vec()
    before = idx.probe(q, k=5, max_probe_hamming=3).collect()
    assert before

    # table advances: new vectors the index has never seen
    tbl.merge(_events(spark, _vec_rows(50, seed=1, start_id=1000)))
    with pytest.raises(StaleVectorIndex):
        idx.probe(q, k=5)
    # explicit opt-in still serves the old membership
    stale = idx.probe(q, k=5, max_probe_hamming=3, allow_stale=True).collect()
    assert [(r.vec_id, r.cos_sim) for r in stale] == [
        (r.vec_id, r.cos_sim) for r in before
    ]

    # refresh reassigns WITHOUT refitting: same planes, new membership
    planes_before = idx.meta["state"]
    idx2 = idx.refresh()
    assert idx2.meta["state"] == planes_before
    assert idx2.meta["built_from_version"] == tbl._snapshot()["version"]
    after = idx2.probe(q, k=5, max_probe_hamming=3).collect()
    exp = S.lsh_ann_topk(
        tbl.read(), q, k=5, n_planes=3, seed=7, max_probe_hamming=3
    ).collect()
    assert [(r.vec_id, r.cos_sim) for r in after] == [
        (r.vec_id, r.cos_sim) for r in exp
    ]
    # generation lifecycle: every referenced generation exists; a
    # superseded generation may linger (reclamation is DEFERRED so a
    # concurrent reader's lazy job keeps its files) and is swept at the
    # start of the NEXT build/refresh
    import os

    gens = {d for d in os.listdir(idx2.root) if d.startswith("d-")}
    referenced = set(idx2.meta["list_dirs"].values()) | {idx2.meta["data_rel"]}
    assert referenced <= gens
    superseded = gens - referenced
    idx3 = VectorIndex.build(
        tbl, "ann", kind="lsh", n_planes=3, seed=7, _state=planes_before
    )
    gens3 = {d for d in os.listdir(idx3.root) if d.startswith("d-")}
    assert superseded.isdisjoint(gens3), "deferred reclaim did not sweep"


def test_vector_index_load_roundtrip(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path, n=60)
    tbl.build_vector_index("ann", kind="lsh", n_planes=3, seed=7)
    # a fresh handle (new process analog) loads the persisted state
    reloaded = LakeTable.load(spark, tbl.root).vector_index("ann")
    q = _query_vec()
    got = reloaded.probe(q, k=5, max_probe_hamming=3).collect()
    exp = S.lsh_ann_topk(
        tbl.read(), q, k=5, n_planes=3, seed=7, max_probe_hamming=3
    ).collect()
    assert [(r.vec_id, r.cos_sim) for r in got] == [
        (r.vec_id, r.cos_sim) for r in exp
    ]
    with pytest.raises(FileNotFoundError):
        tbl.vector_index("nope")


def test_incremental_refresh_touches_only_affected_lists(spark, tmp_path):
    """Verdict round-4 directive 2: refresh() consumes the change feed
    and rewrites only the lists containing changed keys; probe results
    equal a from-scratch rebuild."""
    import os

    tbl = _mk_table(spark, tmp_path, n=300)
    idx = tbl.build_vector_index("ivf", kind="ivf", n_lists=8, seed=7)
    lists_before = dict(idx.meta["list_dirs"])
    n_lists_on_disk = len(lists_before)
    assert n_lists_on_disk >= 6  # 300 random vectors spread over 8 lists

    # small batch: 5 upserts (3 new, 2 overwriting existing keys with a
    # LATER seq) + 1 delete of an existing key
    up = _vec_rows(3, seed=5, start_id=5000) + [
        (7, [float(x) for x in np.random.default_rng(42).standard_normal(DIM)],
         "2024-01-02 00:00:00", "I", 9001),
        (11, [float(x) for x in np.random.default_rng(43).standard_normal(DIM)],
         "2024-01-02 00:00:00", "I", 9002),
        (13, None, "2024-01-02 00:00:00", "D", 9003),
    ]
    tbl.merge(_events(spark, up))

    idx = idx.refresh()
    r = idx.last_refresh
    assert r["mode"] == "incremental"
    affected = set(r["lists_rewritten"])
    # a handful of changed rows must not touch every list
    assert 0 < len(affected) < n_lists_on_disk
    # every directory READ belongs to an affected list
    for d in r["dirs_read"]:
        lid = int(d.rsplit("_list=", 1)[1])
        assert lid in affected
    # unchanged lists keep their ORIGINAL generation pointer (files
    # untouched); affected lists moved to the new generation
    after = idx.meta["list_dirs"]
    for lid, rel in lists_before.items():
        if int(lid) not in affected:
            assert after[lid] == rel, f"unchanged list {lid} was rewritten"
    for lid in affected:
        if str(lid) in after:
            assert after[str(lid)] != lists_before.get(str(lid))

    # membership now equals a from-scratch rebuild with the same state
    q = _query_vec()
    got = idx.probe(q, k=10, n_probe=8).collect()  # probe all lists
    rebuilt = VectorIndex.build(
        tbl, "ivf_rebuild", kind="ivf", n_lists=8, seed=7,
        _state=idx.meta["state"],
    )
    exp = rebuilt.probe(q, k=10, n_probe=8).collect()
    assert [(r_.vec_id, r_.cos_sim) for r_ in got] == [
        (r_.vec_id, r_.cos_sim) for r_ in exp
    ]
    # deleted key is gone from the index
    all_ids = {r_.vec_id for r_ in idx.probe(q, k=1000, n_probe=8).collect()}
    assert 13 not in all_ids
    assert 5000 in all_ids and 7 in all_ids

    # orphan sweep: a later refresh/build reclaims generations no
    # pointer references
    tbl.merge(_events(spark, _vec_rows(2, seed=9, start_id=6000)))
    idx = idx.refresh()
    gens = {d for d in os.listdir(idx.root) if d.startswith("d-")}
    referenced = set(idx.meta["list_dirs"].values()) | {idx.meta["data_rel"]}
    assert gens <= referenced


def test_incremental_refresh_noop_range_advances_version(spark, tmp_path):
    """A compaction-only table advance (no row changes) must advance
    built_from_version without rewriting any list."""
    tbl = _mk_table(spark, tmp_path, n=120)
    idx = tbl.build_vector_index("ann", kind="lsh", n_planes=3, seed=7)
    before = dict(idx.meta["list_dirs"])
    tbl.compact()
    if tbl._version() == idx.meta["built_from_version"]:
        return  # compact was a no-op commit; nothing to assert
    idx = idx.refresh()
    assert idx.last_refresh["lists_rewritten"] == []
    assert idx.meta["list_dirs"] == before
    assert idx.meta["built_from_version"] == tbl._version()


def test_probe_lists_bounded_at_large_n_planes(spark, tmp_path):
    """Verdict round-4 directive 4: multi-probe enumeration is margin-
    ordered and budget-bounded — n_planes=24 with hamming<=2 must not
    enumerate C(24,2)+C(24,1)+1 = 301 buckets."""
    import json as _json
    import os

    tbl = _mk_table(spark, tmp_path, n=40)
    idx = tbl.build_vector_index("ann", kind="lsh", n_planes=4, seed=7)
    # graft a 24-plane state onto the meta (probe_lists is driver-side
    # math over meta; no data files needed for this property)
    m = idx.meta
    rng = np.random.default_rng(3)
    m["state"] = rng.standard_normal((24, DIM)).tolist()
    m["n_planes"] = 24
    with open(os.path.join(idx.root, "meta.json"), "w") as f:
        _json.dump(m, f)

    q = _query_vec()
    lists = idx.probe_lists(q, max_probe_hamming=2, max_probe_lists=64)
    assert len(lists) <= 64
    qb = next(iter(idx.probe_lists(q, max_probe_hamming=0)))
    assert qb in lists
    # shell-0 and the whole hamming-1 shell fit in a 64 budget: the 24
    # single-flip buckets must all be present (shells fill in order)
    ham1 = {qb ^ (1 << i) for i in range(24)}
    assert ham1 <= set(lists)
    # budget smaller than shell-1: the flips kept are the SMALLEST-
    # margin planes (the multi-probe LSH order)
    short = idx.probe_lists(q, max_probe_hamming=2, max_probe_lists=9)
    assert len(short) == 9
    margins = sorted(
        range(24),
        key=lambda i: (abs(float(np.dot(np.asarray(q), np.asarray(m["state"][i])))), i),
    )
    expect = {qb} | {qb ^ (1 << i) for i in margins[:8]}
    assert set(short) == expect


def test_probe_receipt_totals_gated_by_debug_flag(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path, n=80)
    idx = tbl.build_vector_index("ann", kind="lsh", n_planes=3, seed=7)
    q = _query_vec()
    idx.probe(q, k=5).collect()
    assert idx.last_probe["files_total"] is None  # no O(all lists) sweep
    idx.debug_receipts = True
    idx.probe(q, k=5).collect()
    assert idx.last_probe["files_total"] >= len(idx.last_probe["files_read"])


def test_streaming_applier_keeps_index_fresh(spark, tmp_path):
    """Verdict round-4 directive 3: with refresh_index_every set, a
    multi-batch CDC stream keeps the table's ANN index queryable — each
    refresh is the incremental change-feed path, and after the run the
    index is exactly current (no allow_stale needed)."""
    from bear_spark.sources.changelog import write_changelog
    from bear_spark.streaming import CDCApplier

    tbl = _mk_table(spark, tmp_path, n=250)
    idx = tbl.build_vector_index("ivf", kind="ivf", n_lists=8, seed=7)
    v0 = idx.meta["built_from_version"]

    # 3 log chunks: inserts, overwrites of existing keys, deletes
    rows = (
        _vec_rows(30, seed=50, start_id=2000)
        + [
            (i, [float(x) for x in np.random.default_rng(60 + i).standard_normal(DIM)],
             "2024-01-03 00:00:00", "I", 10_000 + i)
            for i in range(10)
        ]
        + [(i, None, "2024-01-03 00:00:00", "D", 20_000 + i) for i in range(40, 50)]
    )
    ev = _events(spark, rows)
    log_dir = str(tmp_path / "log")
    write_changelog(ev, log_dir, n_chunks=3)

    app = CDCApplier(
        spark, tbl, log_dir, str(tmp_path / "ckpt"), str(tmp_path / "metrics"),
        max_files_per_trigger=1, refresh_index_every=1,
        event_schema=ev.schema,
    )
    metrics = app.run_available()
    applied = [m for m in metrics if not m.get("skipped")]
    assert len(applied) == 3
    assert all(m.get("indexes_refreshed") == 1 for m in applied)

    # the index is CURRENT: probe succeeds without allow_stale and its
    # refreshes were the incremental path
    idx = tbl.vector_index("ivf")
    assert idx.meta["built_from_version"] == tbl._version() > v0
    q = _query_vec()
    got = idx.probe(q, k=15, n_probe=8).collect()
    exp = S.ivf_ann_topk(tbl.read(), q, idx.meta["state"], k=15, n_probe=8).collect()
    assert [(r.vec_id, r.cos_sim) for r in got] == [
        (r.vec_id, r.cos_sim) for r in exp
    ]
    deleted = {r.vec_id for r in idx.probe(q, k=1000, n_probe=8).collect()}
    assert deleted.isdisjoint(range(40, 50))
