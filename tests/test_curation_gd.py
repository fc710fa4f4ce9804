"""Classifier feature-build twins: the Arrow mapInPandas kernel
(default since round 9) must be bit-identical to the
Catalyst-expression formulation it replaced — same tokenization,
same md5-56 bucket hash, same label rule — so the oracle parity the
expression twin earned transfers to the Arrow path by equality.
"""
from __future__ import annotations

from tests.conftest import SF001


def _by_doc(rows):
    return {r["doc_id"]: (r["source"], r["y"], tuple(r["xs"]))
            for r in rows}


def test_dense_features_twins_identical(spark):
    from energi_data_pipeline_spark.queries.curation import (
        _dense_features, _dense_features_exprs)

    arrow = _by_doc(_dense_features(spark, SF001).collect())
    spark.catalog.clearCache()
    exprs = _by_doc(_dense_features_exprs(spark, SF001).collect())
    spark.catalog.clearCache()
    assert arrow == exprs


def test_feature_vectors_shape_and_labels(spark):
    from energi_data_pipeline_spark.queries.curation import (
        D_FEATS, _dense_features)

    rows = _dense_features(spark, SF001).collect()
    spark.catalog.clearCache()
    assert rows, "empty corpus?"
    for r in rows:
        assert len(r["xs"]) == D_FEATS + 1
        assert r["xs"][D_FEATS] == 1.0  # bias slot
        assert r["y"] in (0.0, 1.0)
    # the label rule evaluates (every sf0.001 doc happens to pass
    # the gate, so a constant 1.0 here is the data, not a bug — the
    # twins-equality test above carries the semantic pin)
    assert all(r["y"] == 1.0 or r["y"] == 0.0 for r in rows)
