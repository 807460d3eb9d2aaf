"""Changelog (WAL/binlog) sources and sinks."""
