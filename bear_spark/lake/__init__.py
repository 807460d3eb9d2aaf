"""From-scratch copy-on-write lake-table format (parquet + JSON snapshots).

No Iceberg/Delta jars ship in this environment, so the lake layer is
built from first principles with the same guarantees the north rule asks
of Iceberg: atomic snapshot commits, copy-on-write MERGE keyed by
``(conv_id, turn_idx)``, a commit log keyed by ``(source_partition,
offset_range)`` embedded in the snapshot (so data + offsets commit in
ONE atomic metadata swap — that is the exactly-once two-phase commit),
schema evolution via a registry of schema versions, and bucket
partitioning on ``conv_id`` for merge pruning and conversation locality.
"""

from bear_spark.lake.table import LakeTable
from bear_spark.lake.vector_index import StaleVectorIndex, VectorIndex

__all__ = ["LakeTable", "VectorIndex", "StaleVectorIndex"]
