"""mapInArrow integer-dot kernel == JVM zip_with fold, bit for bit."""

from __future__ import annotations

from ecommerce_analytics_spark.operators.arrow_ops import q_knn_int8_arrow
from ecommerce_analytics_spark.operators.similarity import q_knn_int8

SF = "/root/testdata/sf0.001"


def test_arrow_twin_equals_jvm_fold(spark):
    a = q_knn_int8_arrow(spark, SF)
    b = q_knn_int8(spark, SF)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
