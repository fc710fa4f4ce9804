"""DuckDB oracle replaying the reference pipeline's semantics
(silver_transform.py / gold_aggr.py) over the bronze fixture.

The SQL is generated from the engine's own column maps
(operators.silver / operators.gold) so the oracle and the engine
cover the identical 23-column gold surface; the *semantics* —
watermark f-string interpolation, 4-minute timedelta lookback,
ON CONFLICT DO NOTHING, unpartitioned 5-row frames — mirror the
reference exactly (gold_aggr.py:59-221, silver_transform.py:54-106).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb

from energi_data_pipeline_spark.operators.gold import (AVG_MEASURES,
                                                       STDDEV_MEASURES)

EPOCH = datetime(1970, 1, 1)

_FACT_EXPRS = [
    ("minutes1_utc", "time_id"),
    ("co2_emission", "co2_emission"),
    ("production_ge100_mw", "production_large_plants"),
    ("production_lt100_mw", "production_small_plants"),
    ("solar_power", "solar_production"),
    ("offshore_wind_power", "offshore_wind_production"),
    ("onshore_wind_power", "onshore_wind_production"),
    ("exchange_sum", "exchange_sum"),
    ("exchange_dk1_de + exchange_dk2_de", "exchange_germany"),
    ("exchange_dk1_nl", "exchange_netherlands"),
    ("exchange_dk1_gb", "exchange_great_brt"),
    ("exchange_dk1_no", "exchange_norway"),
    ("exchange_dk1_se + exchange_dk2_se", "exchange_sweden"),
    ("exchange_dk1_dk2", "exchange_dk1_dk2"),
]

_TS_DERIVED = {
    "total_production":
        "production_large_plants + production_small_plants",
    "renewable_ratio":
        "CASE WHEN production_large_plants + production_small_plants > 0 "
        "THEN (solar_production + offshore_wind_production + "
        "onshore_wind_production) / (production_large_plants + "
        "production_small_plants) ELSE 0 END",
    "wind_production":
        "offshore_wind_production + onshore_wind_production",
}


def set_bronze_view(con: duckdb.DuckDBPyConnection, bronze_parquet: str,
                    upto=None) -> None:
    """(Re)point the bronze view, optionally truncated at ``upto`` —
    lets incremental tests replay phase-1/phase-2 visibility."""
    where = f"WHERE minutes1_utc <= TIMESTAMP '{upto}'" if upto else ""
    con.execute("DROP VIEW IF EXISTS bronze_raw")
    con.execute(f"""CREATE VIEW bronze_raw AS
        SELECT * FROM read_parquet('{bronze_parquet}/*.parquet') {where}""")


def connect(bronze_parquet: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    set_bronze_view(con, bronze_parquet)
    con.execute("""CREATE TABLE dim_time (
        time_id TIMESTAMP PRIMARY KEY, date DATE, hour INTEGER,
        minute INTEGER, day_of_week INTEGER, is_weekend BOOLEAN,
        season INTEGER)""")
    fact_cols = ", ".join(f"{dst} DOUBLE" for _, dst in _FACT_EXPRS[1:])
    con.execute(f"""CREATE TABLE fact_power_system (
        time_id TIMESTAMP PRIMARY KEY, {fact_cols})""")
    gold_cols = ", ".join(
        f"{c} DOUBLE" for c in list(AVG_MEASURES) + list(STDDEV_MEASURES)
        + ["wind_solar_ratio"])
    con.execute(f"""CREATE TABLE power_system_5min_avg (
        time_id TIMESTAMP PRIMARY KEY, {gold_cols},
        day_of_week INTEGER, hour_of_day INTEGER, is_weekend BOOLEAN,
        season INTEGER)""")
    return con


def run_silver(con: duckdb.DuckDBPyConnection) -> None:
    wm = con.execute(
        "SELECT COALESCE(MAX(time_id), TIMESTAMP '1970-01-01') "
        "FROM fact_power_system").fetchone()[0]
    con.execute(f"""INSERT INTO dim_time
        SELECT DISTINCT minutes1_utc,
               CAST(minutes1_utc AS DATE),
               EXTRACT(HOUR FROM minutes1_utc),
               EXTRACT(MINUTE FROM minutes1_utc),
               EXTRACT(DOW FROM minutes1_utc),
               EXTRACT(DOW FROM minutes1_utc) IN (0, 6),
               CASE WHEN EXTRACT(MONTH FROM minutes1_utc) IN (12,1,2) THEN 0
                    WHEN EXTRACT(MONTH FROM minutes1_utc) IN (3,4,5) THEN 1
                    WHEN EXTRACT(MONTH FROM minutes1_utc) IN (6,7,8) THEN 2
                    ELSE 3 END
        FROM bronze_raw WHERE minutes1_utc > '{wm}'
        ON CONFLICT (time_id) DO NOTHING""")
    exprs = ", ".join(f"{src} AS {dst}" for src, dst in _FACT_EXPRS)
    con.execute(f"""INSERT INTO fact_power_system
        SELECT {exprs} FROM bronze_raw
        WHERE minutes1_utc > '{wm}' AND minutes1_utc IS NOT NULL
        ON CONFLICT (time_id) DO NOTHING""")


def run_gold(con: duckdb.DuckDBPyConnection) -> None:
    wm = con.execute(
        "SELECT COALESCE(MAX(time_id), TIMESTAMP '1970-01-01') "
        "FROM power_system_5min_avg").fetchone()[0]
    ts_cols = ", ".join(
        [f"{expr} AS {name}" for name, expr in _TS_DERIVED.items()])
    frame = ("OVER (ORDER BY time_id "
             "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)")
    window_cols = ", ".join(
        [f"AVG({src}) {frame} AS {dst}"
         for dst, src in AVG_MEASURES.items()]
        + [f"STDDEV({src}) {frame} AS {dst}"
           for dst, src in STDDEV_MEASURES.items()])
    out_cols = ", ".join(list(AVG_MEASURES) + list(STDDEV_MEASURES))
    con.execute(f"""INSERT INTO power_system_5min_avg
        WITH time_series AS (
            SELECT fs.*, {ts_cols},
                   dt.day_of_week, dt.hour AS hour_of_day,
                   dt.is_weekend, dt.season
            FROM fact_power_system fs
            JOIN dim_time dt ON fs.time_id = dt.time_id
            WHERE fs.time_id > '{wm - timedelta(minutes=4)}'),
        aggregated AS (
            SELECT time_id, {window_cols},
                   CASE WHEN solar_production > 0
                        THEN wind_production / solar_production
                        ELSE 1 END AS wind_solar_ratio,
                   day_of_week, hour_of_day, is_weekend, season
            FROM time_series)
        SELECT time_id, {out_cols}, wind_solar_ratio,
               day_of_week, hour_of_day, is_weekend, season
        FROM aggregated WHERE time_id > '{wm}'
        ON CONFLICT (time_id) DO NOTHING""")
