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
    """Canonicalize one value for order-insensitive comparison.

    Deliberately STRICT (round-1 lesson, VERDICT.md "What's wrong"
    #3): the driver's hash preserves the typed representation, so
    collapsing ``Decimal`` to ``float`` here certified false greens
    for queries the driver hash-failed.  Decimals keep their exact
    scale/representation; a query that wants value parity must cast
    to DOUBLE/BIGINT on BOTH engines before the compare boundary."""
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
        return "dec:" + format(v, "f")
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_type(t) -> str:
    """Map a Spark dtype string or DuckDB type to one canonical
    class, so int-width / decimal-vs-double / HUGEINT drifts between
    the engines fail the gate the way the driver's typed hash does."""
    s = str(t).strip().lower()
    if s.endswith("[]"):
        return f"array<{canon_type(s[:-2])}>"
    if s.startswith("array<") and s.endswith(">"):
        return f"array<{canon_type(s[6:-1])}>"
    if s.startswith("decimal"):
        return s.replace(" ", "")
    return {
        "tinyint": "i8", "utinyint": "i8",
        "smallint": "i16", "usmallint": "i16",
        "int": "i32", "integer": "i32", "uinteger": "i32",
        "bigint": "i64", "ubigint": "i64", "long": "i64",
        "hugeint": "i128", "uhugeint": "i128",
        "double": "f64", "float8": "f64",
        "float": "f32", "real": "f32", "float4": "f32",
        "varchar": "str", "string": "str", "text": "str",
        "timestamp": "ts", "timestamp_ntz": "ts",
        "timestamp with time zone": "ts", "timestamp_ns": "ts",
        "timestamp_ms": "ts", "timestamp_s": "ts",
        "date": "date",
        "boolean": "bool", "bool": "bool",
        "blob": "bin", "binary": "bin", "bytea": "bin",
    }.get(s, s)


def rows_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> dict:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    s_types = {c: canon_type(t) for c, t in spark_df.dtypes}
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_types = {c: canon_type(t) for c, t in zip(d_cols, rel.types)}
    d_rows = rel.fetchall()

    result = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "count_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "types_match": s_types == d_types,
    }
    if not result["types_match"]:
        result["type_drift"] = {
            c: (s_types.get(c), d_types.get(c))
            for c in set(s_types) | set(d_types)
            if s_types.get(c) != d_types.get(c)}
    # raw DECIMAL / int128 at the compare boundary hash-failed at the
    # driver in round 1 even when values printed identically locally
    # (engine-side physical representation drift); ban them outright.
    unsafe = sorted(
        c for types in (s_types, d_types) for c, t in types.items()
        if "decimal" in t or t == "i128")
    result["boundary_safe"] = not unsafe
    if unsafe:
        result["unsafe_boundary_types"] = unsafe
    s_set = rows_multiset(s_cols, [tuple(r) for r in s_rows])
    d_set = rows_multiset(d_cols, d_rows)
    result["value_match"] = s_set == d_set
    if not result["value_match"]:
        s_only = [r for r in s_set if r not in set(d_set)][:3]
        d_only = [r for r in d_set if r not in set(s_set)][:3]
        result["spark_only_sample"] = s_only
        result["duck_only_sample"] = d_only
    result["ok"] = (result["count_match"] and result["schema_match"]
                    and result["types_match"] and result["value_match"]
                    and result["boundary_safe"])
    return result
