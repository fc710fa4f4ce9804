"""Property tests for the curation-family invariants: sequence
packing's offsets must tile the token stream exactly, and the
mixture sampler's decisions must be a pure function of
(doc_id, source) at the declared rate.  Fuzzes the DATA (not the
engine) via small synthetic document tables."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from energi_data_pipeline_spark.queries import load_all

docs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9999),      # doc_id
              st.sampled_from(["sA", "sB", "sC"]),           # source
              st.text(alphabet="ab x", min_size=0, max_size=40)),
    min_size=1, max_size=25,
    unique_by=lambda r: r[0])


def _table(spark, data, tmp_path):
    import pandas as pd

    # one parquet FILE per table, like the driver's test data (the
    # engine's footer peek reads the file directly)
    pd.DataFrame(
        [(int(i), s, t, "en", len(t)) for i, s, t in data],
        columns=["doc_id", "source", "text", "lang", "n_chars"],
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(
        str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=docs)
def test_sequence_pack_tiles_the_stream(spark, tmp_path_factory, data):
    from energi_data_pipeline_spark.queries.curation import PACK_BUDGET

    sf_dir = _table(spark, data,
                    tmp_path_factory.mktemp("pack"))
    reg = load_all()
    rows = reg["curation_sequence_pack"].fn(spark, sf_dir).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r.doc_id)
        # offsets are the exclusive running sum — no gaps, no overlap
        expect = 0
        for r in rs:
            assert r.start_offset == expect
            assert r.pack_id == expect // PACK_BUDGET
            fits = (expect % PACK_BUDGET) + r.n_tokens <= PACK_BUDGET
            assert r.fits_in_pack == fits
            expect += r.n_tokens


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=docs)
def test_mixture_sample_is_deterministic_hash(spark, tmp_path_factory,
                                              data):
    import hashlib

    from energi_data_pipeline_spark.queries.curation import (
        MIX_BASE, MIX_SPREAD)

    sf_dir = _table(spark, data,
                    tmp_path_factory.mktemp("mix"))
    reg = load_all()
    rows = reg["curation_mixture_sample"].fn(spark, sf_dir).collect()

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)

    assert len(rows) == len(data)
    for r in rows:
        rate = MIX_BASE + h(f"w_{r.source}") % MIX_SPREAD
        bucket = h(f"mix_{r.doc_id}") % 100
        assert r.rate_pct == rate
        assert r.bucket == bucket
        assert r.sampled == (bucket < rate)
