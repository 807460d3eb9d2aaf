"""bear_spark — a from-scratch, PySpark-native CDC / incremental-ingest
analytics engine with the query and data-processing capabilities of
UW-Madison-DSI/bear (reference snapshot at /root/reference, read-only).

The reference is an academic data-integration backend: it incrementally
tails a REST source with resumable cursors, stages raw pages as parquet
chunks, parses/validates them, and applies them to a store via idempotent
primary-key upserts (reference: bear/ingest.py:12-27, bear/db.py:72-83),
then serves filter + top-k + rerank queries. This package re-expresses the
same capabilities Spark-first:

- ``lake``       copy-on-write table format (snapshot metadata + atomic
                 commit + commit-log fencing) — the Iceberg-shaped sink.
- ``operators``  the query/dataflow operator library (LWW dedup, rerank,
                 top-k, text analysis, document dedup, similarity search).
- ``streaming``  Structured Streaming changelog tail + exactly-once apply.
- ``sources``    changelog (WAL) reader/writer.
- ``events``     deterministic synthetic change-event generator.
- ``oracle``     single-threaded pandas replay oracle for equivalence tests.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
