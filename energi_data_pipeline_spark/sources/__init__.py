"""Data sources: REST ingestion + JSON normalization."""
