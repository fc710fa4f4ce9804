"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship gold-layer query; ``queries`` /
``oracle_sql`` expose the full oracle-paired catalog from
``energi_data_pipeline_spark.queries`` (SURVEY.md §2 inventory +
LLM-pipeline extension operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from energi_data_pipeline_spark.queries import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["gold_events_full"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get
    the driver's weaker rows-only check)."""
    return {name: qd.oracle for name, qd in load_all().items()
            if qd.oracle is not None}
