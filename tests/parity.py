"""DuckDB-oracle differential harness (SURVEY.md §5.1).

Mirrors the driver's compare: run the Spark query and the DuckDB
oracle on the same parquet tables, then check row count, column
names, and order-insensitive canonicalized values.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(v):
    """Canonicalize one value for order-insensitive comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def rows_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> dict:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    result = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "count_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
    }
    s_set = rows_multiset(s_cols, [tuple(r) for r in s_rows])
    d_set = rows_multiset(d_cols, d_rows)
    result["value_match"] = s_set == d_set
    if not result["value_match"]:
        s_only = [r for r in s_set if r not in set(d_set)][:3]
        d_only = [r for r in d_set if r not in set(s_set)][:3]
        result["spark_only_sample"] = s_only
        result["duck_only_sample"] = d_only
    result["ok"] = (result["count_match"] and result["schema_match"]
                    and result["value_match"])
    return result
