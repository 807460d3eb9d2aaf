"""Arrow-native per-bucket COW apply — the merge hot path.

The SQL apply path shuffles (batch ∪ touched-bucket table rows) through
an exchange, aggregates, and writes via Spark's writer — the whole table
crosses the shuffle every merge. This path exploits what the table
already knows: data files are bucket-partitioned on shared storage, so
only the BATCH needs to move. ``groupBy(_bucket).applyInPandas`` routes
each bucket's change events to one task; the task reads that bucket's
existing files directly (pyarrow, column-parallel C++), applies
last-writer-wins vectorized in pandas (stable sort by (ts, lsn) +
group-tail), and writes the replacement files itself — the same
file-granularity copy-on-write an Iceberg/Delta COW writer performs,
with the engine's two-phase snapshot commit unchanged on top.

Everything is Arrow-batch vectorized — no per-row Python anywhere
(`input_hint`: "vectorized pandas/Arrow UDFs (no per-row Python)
throughout"). Task retries are idempotent: each bucket writes to a
deterministic file name via tmp + ``os.replace``.

Reference analog: the store-side PK upsert the reference delegates to
Milvus (reference: bear/db.py:72-83) — here the "store" is the lake and
the upsert kernel is ours.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

_ARROW_TYPES = {
    "string": "string",
    "integer": "int32",
    "long": "int64",
    "short": "int16",
    "byte": "int8",
    "float": "float32",
    "double": "float64",
    "boolean": "bool_",
    "date": "date32",
}


def _arrow_type(pa, spark_typename: str):
    if spark_typename == "timestamp":
        return pa.timestamp("us", tz="UTC")
    name = _ARROW_TYPES.get(spark_typename)
    if name is None:
        raise TypeError(f"unsupported payload type for arrow apply: {spark_typename}")
    return getattr(pa, name)()


def _arrow_schema(pa, spark_json: dict):
    """Flat Spark StructType JSON -> pyarrow schema (payload types only)."""
    return pa.schema(
        [(f["name"], _arrow_type(pa, f["type"])) for f in spark_json["fields"]]
    )


def make_apply_kernel(
    files_by_bucket: dict[int, list[str]],
    target_schema_json: dict,
    stage_dir: str,
    key_cols: list[str],
    seq_col: str,
    compression: str = "snappy",
) -> Callable:
    """Build the applyInPandas kernel for one merge.

    ``files_by_bucket``: existing data-file paths per touched bucket
    (already absolute; all schema versions — alignment to the target
    schema happens here, which is exactly the registry-reconciler's
    "rewrite Arrow batches" step).
    """

    def kernel(pdf):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        bucket = int(pdf["_bucket"].iloc[0])
        target = _arrow_schema(pa, target_schema_json)
        payload_names = [f.name for f in target]
        # event shape: payload + _bucket/_op/_elsn
        evt_schema = pa.schema(
            list(target)
            + [
                pa.field("_bucket", pa.int32()),
                pa.field("_op", pa.string()),
                pa.field("_elsn", pa.int64()),
            ]
        )

        def align_to_events(tbl: pa.Table, op_arr, elsn_arr) -> pa.Table:
            cols = []
            n = tbl.num_rows
            for f in evt_schema:
                if f.name == "_op":
                    cols.append(op_arr)
                elif f.name == "_elsn":
                    cols.append(elsn_arr.cast(pa.int64()))
                elif f.name == "_bucket":
                    cols.append(pa.array([bucket] * n, pa.int32()))
                elif f.name in tbl.column_names:
                    cols.append(tbl.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.table(cols, schema=evt_schema)

        # --- batch side (already target-aligned by the JVM projection) ---
        batch = pa.Table.from_pandas(pdf, preserve_index=False)
        batch = align_to_events(
            batch, batch.column("_op").cast(pa.string()), batch.column("_elsn")
        )

        # --- existing files for this bucket (old schema versions OK) ---
        parts = [batch]
        for path in files_by_bucket.get(bucket, ()):
            t = pq.read_table(path)
            deleted = pc.fill_null(t.column("_deleted").cast(pa.bool_()), False)
            op = pc.if_else(deleted, pa.scalar("D"), pa.scalar("U"))
            parts.append(align_to_events(t, op.cast(pa.string()), t.column("_lsn")))
        events = pa.concat_tables(parts)

        # --- LWW, vectorized: stable sort by (seq, lsn), group-tail ------
        df = events.to_pandas()
        df = df.sort_values([seq_col, "_elsn"], kind="stable", na_position="first")
        winners = df.groupby(key_cols, sort=False, dropna=False).tail(1)

        # --- write replacement files (file-granularity COW) --------------
        out_schema = pa.schema(
            list(target)
            + [
                pa.field("_bucket", pa.int32()),
                pa.field("_lsn", pa.int64()),
                pa.field("_deleted", pa.bool_()),
            ]
        )
        counts = {False: 0, True: 0}
        for deleted, sub in winners.groupby(winners["_op"].eq("D"), sort=False):
            out = sub[payload_names + ["_bucket"]].copy()
            out["_lsn"] = sub["_elsn"]
            out["_deleted"] = bool(deleted)
            tbl = pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)
            d = os.path.join(
                stage_dir, f"_bucket_dir={bucket}", f"_del={str(bool(deleted)).lower()}"
            )
            os.makedirs(d, exist_ok=True)
            final_path = os.path.join(d, f"part-{bucket:05d}.parquet")
            tmp_path = final_path + f".tmp-{uuid.uuid4().hex}"
            pq.write_table(tbl, tmp_path, compression=compression)
            os.replace(tmp_path, final_path)  # idempotent under task retry
            counts[bool(deleted)] = len(sub)

        return pd.DataFrame(
            [
                {
                    "_bucket": bucket,
                    "rows_written": counts[False] + counts[True],
                    "tombstones": counts[True],
                }
            ]
        )

    return kernel


APPLY_RESULT_SCHEMA = "_bucket int, rows_written long, tombstones long"
