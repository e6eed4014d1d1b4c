"""Constraint validation surfaces beyond the registry query: the
Observation-API monitoring path (zero extra pass)."""

from __future__ import annotations

from pyspark.sql import functions as F



def test_observe_rules_piggybacks_on_write_action(spark, sf_dir,
                                                  tmp_path):
    """Observation metrics arrive from the SAME job that wrote the
    sink — no second scan — and agree with check_constraints'
    dedicated pass."""
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.validate import (
        Rule, check_constraints, observe_rules,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        Rule("neg_quantity", F.col("l_quantity") <= 0),
        Rule("null_orderkey", F.col("l_orderkey").isNull()),
        Rule("discount_range",
             (F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
    ]
    observed, obs = observe_rules(li, "sink_quality", rules)
    observed.write.mode("overwrite").parquet(str(tmp_path / "sink"))
    got = obs.get
    want = {r["rule"]: r["n_violations"]
            for r in check_constraints(li, rules).collect()}
    assert got["n_rows"] == li.count()
    for rule in want:
        assert got[rule] == want[rule], rule
