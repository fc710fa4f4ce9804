"""Structured Streaming variants of the medallion pipeline."""
