from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
#: the x10 corpus some tests exercise scale-adaptive params against.
#: Deliberately NOT tied to SPARK_GRAFT_SF_DIR (that env var targets
#: bench.py): redirecting the x10 sketch-invariants test to an
#: arbitrary bench dir would test the wrong scale; tests skip when
#: the path is absent instead.
SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    from energi_data_pipeline_spark.session import get_spark

    s = get_spark("energi-tests", master="local[8]")
    yield s
    s.stop()
