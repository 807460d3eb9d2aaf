"""Batched embedding transform — the enrichment stage, Spark-native.

The reference embeds documents by slicing resources into batches of 256
and calling an external provider, writing vectors back onto the objects
(reference: bear/embedding.py:216-232; provider dispatch at 27-54,
121-193). The engine keeps the dataflow and replaces the provider with
a deterministic, reproducible embedder so pipelines are testable
hermetically:

- ``embed_text_expr`` — JVM-only: ``dim`` md5-derived components per
  row, computed inside codegen. Deterministic AND reproducible in ANSI
  SQL, so the driver's DuckDB oracle can verify it bit-for-bit.
- ``embed_text_pandas`` — the same vectors produced in an Arrow-batched
  ``mapInPandas`` kernel (hashlib over pandas columns, no per-row
  Python beyond the hash call): the shape real model inference takes
  (batch in → matrix out), swap the kernel body for an actual model.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def embed_text_expr(df: DataFrame, text_col: str = "text", dim: int = 8) -> DataFrame:
    """Append ``e0..e{dim-1}`` double columns in [0, 1): component i is
    a 16-bit slice of md5(text || i), scaled. Pure codegen."""
    out = df
    for i in range(dim):
        h = F.md5(F.concat(F.col(text_col), F.lit(f"#{i}")))
        out = out.withColumn(
            f"e{i}",
            F.round(F.conv(F.substring(h, 1, 4), 16, 10).cast("double") / 65535.0, 6),
        )
    return out


def embed_text_pandas(
    df: DataFrame, text_col: str = "text", dim: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """Arrow-batched embedding kernel: one ``array<double>`` per row,
    identical values to :func:`embed_text_expr` (equivalence-tested)."""
    fields = df.schema.fields + [T.StructField(vec_col, T.ArrayType(T.DoubleType()), True)]
    schema = T.StructType(fields)

    def kernel(batches: Iterator["object"]) -> Iterator["object"]:
        import hashlib

        for pdf in batches:
            texts = pdf[text_col].fillna("")
            vecs = [
                [
                    round(
                        int(hashlib.md5(f"{t}#{i}".encode()).hexdigest()[:4], 16) / 65535.0,
                        6,
                    )
                    for i in range(dim)
                ]
                for t in texts
            ]
            pdf = pdf.copy()
            pdf[vec_col] = vecs
            yield pdf

    return df.mapInPandas(kernel, schema=schema)
