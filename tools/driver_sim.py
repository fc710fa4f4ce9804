"""Simulate the driver's verify pass against __spark_entry__.py.

Uses a VANILLA SparkSession (no engine conf — the driver owns its
session), runs entry() at sf0.001 and every queries() entry at
sf0.01, and compares each against oracle_sql() via DuckDB the same
way the driver does (row count + column names + order-insensitive
canonicalized values).  Prints one status line per query.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from pyspark.sql import SparkSession  # noqa: E402

from parity import compare, duck_connection  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
#: optional substring filters (argv[2:]): run only matching queries
ONLY = sys.argv[2:]


def main() -> int:
    spark = (SparkSession.builder.master("local[8]")
             .appName("driver-sim").getOrCreate())
    import __spark_entry__ as e

    if not ONLY:
        t0 = time.time()
        n = e.entry(spark).count()
        print(f"entry(): {n} rows in {time.time() - t0:.1f}s "
              f"({'OK' if n > 0 else 'EMPTY — FAIL'})")

    qs, oracles = e.queries(), e.oracle_sql()
    if ONLY:
        qs = {n: f for n, f in qs.items()
              if any(pat in n for pat in ONLY)}
    con = duck_connection(SF)
    failures = 0
    from energi_data_pipeline_spark.queries import oracle_scale_guard

    for name, fn in qs.items():
        t0 = time.time()
        try:
            guard_msg = oracle_scale_guard(name, SF)
            if guard_msg is not None and name in oracles:
                # static oracle invalid past its scaling knee: fail
                # loudly, never as an opaque row mismatch
                raise RuntimeError(guard_msg)
            df = fn(spark, SF)
            if name in oracles:
                res = compare(df, con, oracles[name])
                status = "OK " if res["ok"] else "FAIL"
                detail = (f"{res['spark_rows']} rows" if res["ok"] else
                          {k: v for k, v in res.items()
                           if k not in ("spark_cols", "duck_cols")})
            else:
                cnt = df.count()
                status, detail = "ROWS-ONLY", f"{cnt} rows"
        except Exception as ex:  # driver records errors per query
            status, detail = "ERROR", repr(ex)[:200]
        finally:
            # queries cache() optimization barriers that must outlive
            # their return value; drop them once materialized so a
            # long catalog run doesn't accumulate cached partitions
            spark.catalog.clearCache()
        if status == "FAIL" or status == "ERROR":
            failures += 1
        print(f"  {status:9s} {name:32s} {time.time() - t0:5.1f}s  {detail}")
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
