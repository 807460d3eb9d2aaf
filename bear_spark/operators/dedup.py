"""Last-writer-wins dedup — the heart of idempotent CDC apply.

The reference achieves idempotence by delegating to a store-side
primary-key upsert where the last write wins (reference: bear/db.py:72-83,
"slower but ensures no duplicate IDs"); apply order there is simply file
iteration order (reference: bear/ingest.py:71-85). The north rule upgrades
this to an explicit, order-independent total order: per key, the event
with max ``(ts, lsn)`` wins, so replaying any prefix/suffix — in any
arrival order, any number of times — converges to the same state.

Two implementations:

- ``lww_dedup_agg`` (engine default): ``groupBy(key).agg(max_by(row, seq))``
  — a hash aggregation with map-side partial combine. At scale this beats
  the window variant: no per-partition full sort, and the partial
  aggregate shrinks data before the shuffle (hot keys collapse early,
  which also blunts skew).
- ``lww_dedup_window``: ``row_number() over (partition by key order by
  seq desc) = 1`` — the literal shape the north rule names; kept for
  parity and used as the oracle-friendly form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
) -> DataFrame:
    """One row per key: the row with the greatest (seq_cols...) tuple.

    `max_by` over a struct compares lexicographically, matching the
    (ts, lsn) total order. Partial aggregation happens map-side, so the
    shuffle carries at most one row per (map task, key).
    """
    row = F.struct(*[F.col(c) for c in df.columns])
    seq = F.struct(*[F.col(c) for c in seq_cols])
    winner = df.groupBy(*key_cols).agg(F.max_by(row, seq).alias("_row"))
    return winner.select("_row.*")


def lww_dedup_window(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
) -> DataFrame:
    """Window row_number variant (full sort per partition; oracle-parity)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
