"""JSON record normalization: API names -> snake_case columns.

The reference relies on dlt's implicit schema inference + name
normalization (SURVEY.md §1.3): the API yields ``Minutes1UTC``,
``CO2Emission``, ``ProductionGe100MW`` … while silver SQL reads
``minutes1_utc``, ``co2_emission``, ``production_ge100_mw``
(bronze_ingest.py:8-13 vs silver_transform.py:64,88-101).  This
module makes that normalization explicit and deterministic, and pins
the bronze schema to a StructType so re-inference can never drift.
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (DoubleType, StructField, StructType,
                               TimestampType)


def snake_case(name: str) -> str:
    """camelCase/PascalCase/acronym -> snake_case, matching the dlt
    normalizations the reference depends on:

    >>> snake_case("Minutes1UTC")
    'minutes1_utc'
    >>> snake_case("CO2Emission")
    'co2_emission'
    >>> snake_case("ProductionGe100MW")
    'production_ge100_mw'
    >>> snake_case("ExchangeDK1_DE")
    'exchange_dk1_de'
    """
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", name)
    s = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", s)
    return re.sub(r"__+", "_", s).lower()


#: The 16 bronze measure columns (FIXTURES.md §1); ts parsed from the
#: API's ISO string at minute resolution (bronze_ingest.py:26-30).
MEASURES = [
    "co2_emission", "production_ge100_mw", "production_lt100_mw",
    "solar_power", "offshore_wind_power", "onshore_wind_power",
    "exchange_sum", "exchange_dk1_de", "exchange_dk2_de",
    "exchange_dk1_nl", "exchange_dk1_gb", "exchange_dk1_no",
    "exchange_dk1_se", "exchange_dk2_se", "exchange_dk1_dk2",
]

BRONZE_SCHEMA = StructType(
    [StructField("minutes1_utc", TimestampType())]
    + [StructField(m, DoubleType()) for m in MEASURES])


def records_to_bronze(spark: SparkSession, records: list[dict]) -> DataFrame:
    """API JSON dicts -> typed, snake_cased bronze DataFrame.

    Timestamps arrive as ISO strings with optional Z suffix and are
    truncated to minute resolution exactly like
    bronze_ingest.py:26-30 (fromisoformat + strftime '%Y-%m-%dT%H:%M').
    """
    normalized = []
    for rec in records:
        row = {snake_case(k): v for k, v in rec.items()}
        ts = row.get("minutes1_utc")
        if isinstance(ts, str):
            ts = datetime.fromisoformat(ts.replace("Z", "+00:00"))
            ts = ts.replace(tzinfo=None)
        if ts is not None:
            ts = ts.replace(second=0, microsecond=0)
        row["minutes1_utc"] = ts
        normalized.append({
            f.name: (float(row[f.name])
                     if isinstance(f.dataType, DoubleType)
                     and row.get(f.name) is not None
                     else row.get(f.name))
            for f in BRONZE_SCHEMA.fields})
    return spark.createDataFrame(normalized, BRONZE_SCHEMA)


def normalize_columns(df: DataFrame) -> DataFrame:
    """Rename every column of an inferred DataFrame to snake_case."""
    return df.toDF(*[snake_case(c) for c in df.columns])
