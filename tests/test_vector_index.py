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

from bear_spark.lake import LakeTable, StaleVectorIndex
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
    # exactly one data generation remains on disk
    import os

    gens = [d for d in os.listdir(idx2.root) if d.startswith("d-")]
    assert len(gens) == 1


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
