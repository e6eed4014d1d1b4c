"""UDTF lateral expansion == codegen posexplode twin, row-for-row."""

from __future__ import annotations

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.udtf_ops import (
    q_doc_sentences_udtf, sentences_builtin,
)

SF = "/root/testdata/sf0.001"


def test_udtf_equals_builtin_explode(spark):
    got = q_doc_sentences_udtf(spark, SF)
    want = sentences_builtin(load_table(spark, SF, "documents"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0
