"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
are vectorized Arrow-batch passes (``mapInPandas``), never per-row
Python. The actual codecs are not installed in this environment, so the
decode kernel is a clearly-marked deterministic stand-in (length +
md5 checksum) or raises ``NotImplementedError`` for real codec paths —
the Spark-side schema, partitioning, UDF signature, and batch shape are
the real, tested thing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def decode_binary_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Extract (n_bytes, checksum) metadata from a binary column in one
    vectorized Arrow pass per batch."""
    import pandas as pd

    schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("checksum", T.StringType(), False),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payload = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payload.map(len).astype("int64"),
                    "checksum": payload.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.mapInPandas(kernel, schema=schema)


def _fake_decode(payload: bytes) -> bytes:
    """Deterministic stand-in for a codec: expands the payload into a
    reproducible pseudo-pixel buffer (md5 chain). Swap for PIL/cv2
    when codecs are installed — the surrounding plumbing is unchanged."""
    out = bytearray()
    seed = hashlib.md5(payload).digest()
    while len(out) < 64:
        out.extend(seed)
        seed = hashlib.md5(seed).digest()
    return bytes(out[:64])


def extract_features(
    df: DataFrame, id_col: str, payload_col: str, dim: int = 16
) -> DataFrame:
    """payload → feature vector (``array<float>``), one Arrow batch at
    a time. The "model" is a deterministic byte-hash embedding; a real
    encoder slots into the same kernel with the same batch shape."""
    import numpy as np
    import pandas as pd

    schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                (
                    np.frombuffer(
                        hashlib.md5(bytes(b)).digest() * ((4 * dim + 15) // 16),
                        dtype=np.uint8,
                    )[: 4 * dim]
                    .astype(np.float32)
                    .reshape(dim, 4)
                    .mean(axis=1)
                    / 255.0
                ).tolist()
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(kernel, schema=schema)


def resize_images(
    df: DataFrame, id_col: str, payload_col: str, width: int = 8, height: int = 8
) -> DataFrame:
    """payload → decoded + "resized" buffer with (width, height)
    metadata. The decode step is the deterministic stand-in; schema,
    batching, and output contract are the production shape."""
    import pandas as pd

    schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("pixels", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    n = width * height

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(b)) for b in pdf[payload_col]]
            resized = [
                bytes(d[i * len(d) // n] for i in range(n)) for d in decoded
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pixels": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(kernel, schema=schema)


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str, every_n: int = 4, n_frames: int = 16
) -> DataFrame:
    """Video frame sampling: one input row fans out to one row per
    sampled frame (frame_idx + frame bytes) — the batch-in/explode-out
    shape a real demuxer kernel has. Frames here are deterministic
    slices of the fake-decoded buffer."""
    import pandas as pd

    schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, b in zip(pdf[id_col], pdf[payload_col]):
                buf = _fake_decode(bytes(b))
                step = max(1, len(buf) // n_frames)
                for fi in range(0, n_frames, every_n):
                    ids.append(rid)
                    idxs.append(fi)
                    frames.append(buf[fi * step : (fi + 1) * step])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(kernel, schema=schema)
