"""Python Data Source (`energy_power`) tests: batch partition
planning + executor-side reads, and incremental streaming offsets
(the dlt-cursor equivalent, SURVEY.md §2 rows 1-2)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from energi_data_pipeline_spark.sources.datasource import (
    EnergyPowerDataSource, RAW_MEASURES)
from energi_data_pipeline_spark.sources.normalize import (
    normalize_columns, records_to_bronze)

from .fixtures import make_power_records


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("ds") / "power_records.json"
    path.write_text(json.dumps(make_power_records()))
    return str(path)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(EnergyPowerDataSource)
    return spark


def test_batch_read_matches_driver_side_path(registered, fixture_path):
    df = (registered.read.format("energy_power")
          .option("fixture_path", fixture_path)
          .option("num_partitions", "3").load())
    rows = df.collect()
    # fixture minus the NULL-cursor record (incremental sources can
    # never emit a record without a cursor value)
    records = [r for r in make_power_records() if r["Minutes1UTC"]]
    assert len(rows) == len(records)
    assert df.rdd.getNumPartitions() == 3
    # same bronze result as the driver-side createDataFrame path
    via_source = (
        normalize_columns(df)
        .withColumn("minutes1_utc",
                    F.date_trunc("minute", F.to_timestamp("minutes1_utc")))
        .orderBy("minutes1_utc"))
    via_driver = (records_to_bronze(registered, records)
                  .orderBy("minutes1_utc"))
    assert [r.asDict() for r in via_source.collect()] \
        == [r.asDict() for r in via_driver.collect()]


def test_batch_cursor_filters(registered, fixture_path):
    df = (registered.read.format("energy_power")
          .option("fixture_path", fixture_path)
          .option("cursor", "2025-11-29T10:59").load())
    got = df.agg(F.min("Minutes1UTC"), F.count("*")).first()
    assert got[0] > "2025-11-29T10:59"
    assert 0 < got[1] < len(make_power_records())


def test_stream_incremental_offsets(registered, fixture_path, tmp_path):
    out = str(tmp_path / "bronze_out")

    def run_once():
        q = (registered.readStream.format("energy_power")
             .option("fixture_path", fixture_path).load()
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run_once()
    n_all = registered.read.parquet(out).count()
    records = [r for r in make_power_records() if r["Minutes1UTC"]]
    assert n_all == len(records)
    # restart from the same checkpoint: cursor is at the end -> no
    # new rows (the reference's resume-from-state behavior)
    run_once()
    assert registered.read.parquet(out).count() == n_all


def test_schema_covers_all_measures(registered, fixture_path):
    df = (registered.read.format("energy_power")
          .option("fixture_path", fixture_path).load())
    assert df.columns == ["Minutes1UTC"] + RAW_MEASURES
