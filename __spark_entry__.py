"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship LWW-dedup query at sf0.001; ``queries`` /
``oracle_sql`` expose the full operator registry from
``bear_spark.queries`` (SURVEY.md §2 inventory + training-data ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bear_spark.queries import REGISTRY, resolve_oracles  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: last-writer-wins dedup —
    the core CDC apply semantics (SURVEY.md §2.5 W2)."""
    return REGISTRY["lww_dedup_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    return resolve_oracles()
