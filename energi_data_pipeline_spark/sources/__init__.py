"""Data sources: REST ingestion, JSON normalization, and the
registrable Spark 4 Python Data Source (``energy_power`` format,
batch + incremental streaming)."""

from .datasource import EnergyPowerDataSource  # noqa: F401
