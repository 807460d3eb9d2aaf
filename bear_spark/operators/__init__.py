"""Operator library: the query semantics of the reference, Spark-first."""
