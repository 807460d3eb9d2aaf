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


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode would use PIL/cv2 over mapInPandas batches;
    codecs are not available in this container."""
    raise NotImplementedError(
        "image codecs not installed in this environment; "
        "use decode_binary_meta for the plumbing-verified metadata path"
    )


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling stub — same contract as decode_image."""
    raise NotImplementedError("video codecs not installed in this environment")
