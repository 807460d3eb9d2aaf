"""Row validation with error routing (quarantine side-output).

The reference validates per-row in Python try/except, logging and
skipping bad rows (reference: bear/ingest.py:38-44; the Person.parse
invariant assert at bear/model.py:55-67). Spark-native form: one
vectorized pass computes a `_reject_reason` column from declarative
rules; the good split continues the pipeline, the quarantine split
lands in a side table with the reason — no row loss, no per-row
Python, and reject counts flow into lineage metrics.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default rules for transcript change events: name -> violation predicate
TRANSCRIPT_RULES: Mapping[str, Column] = {
    "null_key": F.col("conv_id").isNull() | F.col("turn_idx").isNull(),
    "negative_turn": F.col("turn_idx") < 0,
    "bad_role": ~F.col("role").isin("user", "assistant", "tool", "system")
    & F.col("role").isNotNull(),
    "empty_text": F.col("text").isNull() | (F.length("text") == 0),
}


def validate(
    df: DataFrame, rules: Mapping[str, Column] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (good, quarantine).

    ``rules`` maps reason name -> violation predicate. The quarantine
    frame carries every original column plus ``_reject_reason`` (the
    FIRST violated rule, in rule order — deterministic).
    """
    rules = dict(rules if rules is not None else TRANSCRIPT_RULES)
    reason = F.lit(None).cast("string")
    for name, pred in reversed(rules.items()):
        reason = F.when(pred, F.lit(name)).otherwise(reason)
    tagged = df.withColumn("_reject_reason", reason)
    good = tagged.filter(F.col("_reject_reason").isNull()).drop("_reject_reason")
    bad = tagged.filter(F.col("_reject_reason").isNotNull())
    return good, bad
