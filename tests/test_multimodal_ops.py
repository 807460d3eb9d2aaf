"""Multimodal plumbing: binary payload → metadata / features / resize /
frame-sample as Arrow-batch kernels. Codecs are deterministic fakes;
the schemas, batch shapes, fan-out, and determinism are the real,
tested contract."""

from __future__ import annotations

import pyspark.sql.functions as F

from bear_spark.operators.multimodal import (
    decode_binary_meta,
    extract_features,
    resize_images,
    sample_frames,
)

SF = "/root/testdata/sf0.01"


def _payloads(spark, n=50):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .limit(n)
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )


def test_decode_binary_meta_matches_jvm(spark):
    d = _payloads(spark)
    got = decode_binary_meta(d, "doc_id", "payload").toPandas().set_index("doc_id")
    want = (
        d.select("doc_id", F.length("payload").alias("n"), F.md5("payload").alias("c"))
        .toPandas()
        .set_index("doc_id")
    )
    assert (got["n_bytes"] == want["n"]).all()
    assert (got["checksum"] == want["c"]).all()


def test_extract_features_shape_and_determinism(spark):
    d = _payloads(spark)
    a = extract_features(d, "doc_id", "payload", dim=16).toPandas().set_index("doc_id")
    b = extract_features(d, "doc_id", "payload", dim=16).toPandas().set_index("doc_id")
    assert a["features"].map(len).eq(16).all()
    assert all(list(a.loc[i, "features"]) == list(b.loc[i, "features"]) for i in a.index)
    assert a["features"].map(lambda v: all(0.0 <= x <= 1.0 for x in v)).all()


def test_resize_images_contract(spark):
    d = _payloads(spark)
    out = resize_images(d, "doc_id", "payload", width=8, height=4).toPandas()
    assert (out["width"] == 8).all() and (out["height"] == 4).all()
    assert out["pixels"].map(len).eq(32).all()


def test_sample_frames_fans_out(spark):
    d = _payloads(spark, n=10)
    out = sample_frames(d, "doc_id", "payload", every_n=4, n_frames=16).toPandas()
    per_doc = out.groupby("doc_id").size()
    assert (per_doc == 4).all()  # 16 frames / every 4
    assert sorted(out["frame_idx"].unique()) == [0, 4, 8, 12]
    assert out["frame"].map(len).gt(0).all()
