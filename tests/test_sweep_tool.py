"""tools/sweep.py two-tier workflow units (VERDICT r5 #4, ADVICE r5).

No Spark: these test the change-detection fingerprint and the
--changed selection against synthetic artifacts. The end-to-end path
(full sweep writes fps; --changed reruns only drifted queries and
writes a stamped merged artifact) is exercised for real each round by
the committed SWEEP_r{N} regeneration.
"""

from __future__ import annotations

import importlib.util
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def _sweep_mod():
    spec = importlib.util.spec_from_file_location(
        "sweep_tool", REPO / "tools" / "sweep.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fingerprint_tracks_module_and_oracle():
    sw = _sweep_mod()

    def fn():  # stands in for a registry callable
        pass

    fn.__module__ = "ecommerce_analytics_spark.operators.retail"
    a = sw.fingerprint(fn, "SELECT 1")
    assert a == sw.fingerprint(fn, "SELECT 1")        # deterministic
    assert a != sw.fingerprint(fn, "SELECT 2")        # oracle change
    fn.__module__ = "ecommerce_analytics_spark.operators.joins"
    assert a != sw.fingerprint(fn, "SELECT 1")        # module change
    # missing oracle (rows-only query) is a distinct, stable state
    fn.__module__ = "ecommerce_analytics_spark.operators.retail"
    assert sw.fingerprint(fn, None) == sw.fingerprint(fn, None)
    assert sw.fingerprint(fn, None) != a


def test_fingerprint_closure_covers_helper_modules():
    """A query's fingerprint must track every package module it
    transitively imports — knn_ivfpq lives in ivfpq.py but trains its
    codebooks in pq.py; an edit there must flag it as changed (missed
    in practice before the closure existed)."""
    sw = _sweep_mod()
    closure = sw._module_closure("ecommerce_analytics_spark.operators.ivfpq")
    assert "ecommerce_analytics_spark.operators.pq" in closure
    assert "ecommerce_analytics_spark.operators.ivfpq" in closure
    assert "ecommerce_analytics_spark.io" in closure
    # closure is cached + deterministic
    assert closure == sw._module_closure(
        "ecommerce_analytics_spark.operators.ivfpq")


def test_registry_fingerprints_cover_entry_and_use_true_modules():
    """The entry module wraps every callable (its __module__ is the
    entry itself), which would collapse the module component of every
    fingerprint to one file; registry_fingerprints must read the
    registry's raw spark_fn instead and cover the registry exactly."""
    sw = _sweep_mod()
    from ecommerce_analytics_spark.plans.registry import all_queries
    fps = sw.registry_fingerprints()
    regs = all_queries()
    assert set(fps) == set(regs)
    # distinct implementing modules → the module component is live
    # (two queries from different modules with identical oracles would
    # otherwise collide; all fps must come from >1 source module)
    mods = {q.spark_fn.__module__ for q in regs.values()}
    assert len(mods) > 10
    assert all(m != "se" for m in mods)


def test_select_changed_flags_new_drifted_and_unfingerprinted():
    sw = _sweep_mod()
    fps = {"q_same": "aaa", "q_drift": "bbb", "q_new": "ccc",
           "q_legacy": "ddd"}
    prior = [
        {"q": "q_same", "fp": "aaa", "ok": True},
        {"q": "q_drift", "fp": "OLD", "ok": True},
        {"q": "q_legacy", "ok": True},          # pre-fp artifact row
        {"q": "q_removed", "fp": "zzz", "ok": True},
    ]
    got = sorted(sw.select_changed(fps, prior))
    assert got == ["q_drift", "q_legacy", "q_new"]
