"""Oracle-paired query catalog.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extension
operators) is exposed here as a named query: a PySpark DataFrame
implementation and, where SQL-expressible, a semantically identical
ANSI-SQL oracle that DuckDB runs over the same parquet tables.  The
driver hash-compares the two at sf0.01 — this registry IS the
correctness surface.

Float-determinism conventions (so value-hashes match bit-for-bit):

* per-row arithmetic (+,*,/ of doubles) is IEEE-deterministic in
  both engines — left unrounded;
* SUM/AVG over groups goes through ``DECIMAL(38,10)`` accumulation
  (exact, order-independent) and is cast back to DOUBLE;
* window/stddev/cosine results (order-dependent accumulation with
  ~1e-15 jitter) are rounded to 6 decimals on BOTH sides;
* EXTRACT-style ints are cast to INT explicitly on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> rows-only check (non-SQL-expressible)


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None):
    """Register a (spark_fn, oracle_sql) pair."""

    def deco(fn):
        REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import all query modules and return the populated registry."""
    from . import core  # noqa: F401
    from . import gold_energy  # noqa: F401
    from . import dedup  # noqa: F401
    from . import text  # noqa: F401
    from . import simsearch  # noqa: F401
    from . import streaming  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import asof  # noqa: F401
    from . import relational_ext  # noqa: F401
    from . import tpch  # noqa: F401
    from . import curation  # noqa: F401  (composes dedup+text -> last)
    return REGISTRY
