"""Structured Streaming: changelog tail → exactly-once MERGE apply."""

from bear_spark.streaming.apply import CDCApplier

__all__ = ["CDCApplier"]
