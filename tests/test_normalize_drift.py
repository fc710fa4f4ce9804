"""Bronze schema-drift + lineage golden tests (VERDICT r2 gaps 1-2).

The reference's dlt silently WIDENS the bronze schema when the API
adds a field and stamps ``_dlt_load_id``/``_dlt_id`` lineage columns
(SURVEY §1.3).  Our pinned BRONZE_SCHEMA must therefore (a) never
silently DROP a new API field — unknown keys are quarantined into the
``_extras`` map — and (b) stamp a per-batch ``_load_id`` so a bad
batch is identifiable and surgically deletable from bronze.
"""

from __future__ import annotations

from energi_data_pipeline_spark.sources.normalize import (
    BRONZE_SCHEMA, batch_load_id, records_to_bronze)

from .fixtures import make_power_records


def drifted_records():
    """Fixture payload where the API grew two fields mid-batch."""
    records = [r for r in make_power_records() if r["Minutes1UTC"]][:20]
    for r in records[10:]:
        r["GridFrequency"] = 50.02          # new numeric field
        r["ConnectedArea"] = "DK1"          # new string field
    return records


def test_unknown_api_fields_quarantined_not_dropped(spark):
    df = records_to_bronze(spark, drifted_records())
    rows = df.orderBy("minutes1_utc").collect()
    drifted = [r for r in rows if r["_extras"] is not None]
    clean = [r for r in rows if r["_extras"] is None]
    assert len(drifted) == 10 and len(clean) == 10
    # snake_cased keys, stringified values — nothing silently lost
    assert drifted[0]["_extras"] == {"grid_frequency": "50.02",
                                     "connected_area": "DK1"}
    # the pinned measure columns are untouched by the drift
    for f in BRONZE_SCHEMA.fields:
        assert f.name in df.columns


def test_known_columns_identical_with_and_without_drift(spark):
    base = [r for r in make_power_records() if r["Minutes1UTC"]][:20]
    known_cols = [f.name for f in BRONZE_SCHEMA.fields]
    a = records_to_bronze(spark, base).select(known_cols) \
        .orderBy("minutes1_utc").collect()
    b = records_to_bronze(spark, drifted_records()).select(known_cols) \
        .orderBy("minutes1_utc").collect()
    assert a == b


def test_load_id_content_addressed_and_overridable(spark):
    batch1 = [r for r in make_power_records() if r["Minutes1UTC"]][:5]
    batch2 = [r for r in make_power_records() if r["Minutes1UTC"]][5:10]
    # deterministic: same content -> same id; different -> different
    assert batch_load_id(batch1) == batch_load_id(list(batch1))
    assert batch_load_id(batch1) != batch_load_id(batch2)
    df1 = records_to_bronze(spark, batch1)
    ids = {r["_load_id"] for r in df1.select("_load_id").collect()}
    assert ids == {batch_load_id(batch1)}
    # explicit load id (e.g. an orchestrator run id) wins
    df2 = records_to_bronze(spark, batch1, load_id="run-42")
    assert {r["_load_id"] for r in df2.collect()} == {"run-42"}


def test_bad_batch_is_surgically_deletable(spark):
    good = [r for r in make_power_records() if r["Minutes1UTC"]][:8]
    bad = [r for r in make_power_records() if r["Minutes1UTC"]][8:12]
    bronze = records_to_bronze(spark, good).unionByName(
        records_to_bronze(spark, bad))
    bad_id = batch_load_id(bad)
    repaired = bronze.filter(bronze["_load_id"] != bad_id)
    assert repaired.count() == len(good)
    assert {r["_load_id"] for r in repaired.collect()} \
        == {batch_load_id(good)}
