"""Batch medallion pipelines (bronze -> silver -> gold -> export)."""
