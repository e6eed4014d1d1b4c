"""Product-quantization invariants: code-table shape/determinism,
ADC identity (a vector's ADC distance to its own codes equals the sum
of its per-subspace quantization errors), and the recall floor the
registry companion certifies."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators import pq

SF = "/root/testdata/sf0.001"


def test_codes_shape_and_determinism(spark):
    emb = load_table(spark, SF, "embeddings")
    nemb = pq._normalized(emb)
    cb = pq.train_codebooks(spark, nemb)
    assert cb.count() == pq.PQ_M * pq.PQ_K
    codes1 = pq.encode_pq(nemb, cb)
    codes2 = pq.encode_pq(nemb, cb)
    n = emb.count()
    assert codes1.count() == n
    bad = codes1.filter(
        (F.size("codes") != pq.PQ_M)
        | F.exists("codes", lambda c: (c < 0) | (c >= pq.PQ_K))).count()
    assert bad == 0
    assert (codes1.select("vec_id", "codes").exceptAll(
        codes2.select("vec_id", "codes")).count() == 0)


def test_adc_self_distance_is_quantization_error(spark):
    # d_ADC(q, codes(q)) must equal sum_m ||q_m - C_m[code_m(q)]||^2
    # computed independently — catches LUT/encode index mismatches.
    emb = load_table(spark, SF, "embeddings")
    nemb = pq._normalized(emb).filter(F.col("vec_id") < 4)
    cb = pq.train_codebooks(spark, pq._normalized(emb))
    codes = pq.encode_pq(nemb, cb)
    lut = pq.adc_lut(nemb, cb)
    own = (codes.select("vec_id",
                        F.posexplode("codes").alias("vm", "vcode")))
    adc_self = (own.join(lut, (lut.query_id == own.vec_id)
                         & (lut.m == own.vm) & (lut.code == own.vcode))
                .groupBy("vec_id")
                .agg(F.sum("pd2").alias("adc")))
    # independent recomputation: nearest-centroid distance per subspace
    sub = pq._subvectors(nemb)
    qerr = (sub.join(F.broadcast(cb), "m")
            .groupBy("vec_id", "m")
            .agg(F.min(pq._sq_dist(F.col("s_emb"), F.col("c_emb")))
                 .alias("d2"))
            .groupBy("vec_id").agg(F.sum("d2").alias("qe")))
    joined = adc_self.join(qerr, "vec_id").collect()
    assert len(joined) == 4
    for r in joined:
        assert abs(r.adc - r.qe) < 1e-12


def test_recall_floor_met_at_sf0001(spark):
    row = pq.q_knn_pq_recall(spark, SF).collect()[0]
    assert row.recall_floor_met
    assert row.n_exact_pairs == row.n_queries * row.k


def test_persisted_pq_equals_in_memory(spark):
    got = sorted(map(tuple,
                     pq.q_knn_pq_persisted(spark, SF)
                     .select("query_id", "neighbor_id", "cos_sim", "rank")
                     .collect()))
    want = sorted(map(tuple,
                      pq.q_knn_pq(spark, SF)
                      .select("query_id", "neighbor_id", "cos_sim", "rank")
                      .collect()))
    assert got == want and len(got) > 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
