"""Every registered query must hash-match its DuckDB oracle
(the driver's t2 gate, run here at sf0.001 for speed; the driver
uses sf0.01)."""

from __future__ import annotations

import pytest

from energi_data_pipeline_spark.queries import load_all
from .conftest import SF0001
from .parity import compare, duck_connection

REGISTRY = load_all()
ORACLED = [n for n, qd in REGISTRY.items() if qd.oracle is not None]
ROWS_ONLY = [n for n, qd in REGISTRY.items() if qd.oracle is None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF0001)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    from energi_data_pipeline_spark.queries import oracle_scale_guard

    qd = REGISTRY[name]
    # Oracles with a corpus-size validity knee must fail LOUDLY when
    # the harness is pointed at a scaled corpus (rehearsal data),
    # not with opaque row mismatches.
    msg = oracle_scale_guard(name, SF0001)
    assert msg is None, msg
    df = qd.fn(spark, SF0001)
    res = compare(df, duck, qd.oracle)
    assert res["ok"], f"{name}: {res}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, SF0001)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
