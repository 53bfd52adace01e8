"""The pin protocol's comparison math (scripts/bench_protocol.py):
prior-artifact parsing across formats and the canary-ratio
attribution rules. No Spark — pure driver logic."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "bench_protocol", os.path.join(REPO, "scripts", "bench_protocol.py")
)
bp = importlib.util.module_from_spec(spec)
sys.modules["bench_protocol"] = bp
spec.loader.exec_module(bp)


def test_load_prior_raw_bench_line(tmp_path):
    p = tmp_path / "b.json"
    p.write_text(json.dumps({"queries": {"q1": 1.5, "d2": 0.25}}))
    queries, ratios = bp.load_prior(str(p))
    assert queries == {"q1": 1.5, "d2": 0.25}
    assert ratios is None


def test_load_prior_pinned_artifact_with_ratios(tmp_path):
    p = tmp_path / "pin.json"
    p.write_text(json.dumps({"queries": [
        {"query": "q1", "median": 2.0, "min": 1.8, "ratio_min": 0.7},
        {"query": "d2", "median": 0.4, "min": 0.3, "ratio_min": None},
    ]}))
    queries, ratios = bp.load_prior(str(p))
    # min preferred over median (the throttling-machine estimator)
    assert queries == {"q1": 1.8, "d2": 0.3}
    # only ratio-carrying rows contribute
    assert ratios == {"q1": 0.7}


def test_load_prior_missing_file():
    assert bp.load_prior("/nonexistent/x.json") == (None, None)


def test_load_prior_pre_canary_pin_has_no_ratios(tmp_path):
    p = tmp_path / "old.json"
    p.write_text(json.dumps({"queries": [
        {"query": "q1", "median": 2.0, "min": 1.8},
    ]}))
    queries, ratios = bp.load_prior(str(p))
    assert queries == {"q1": 1.8}
    assert ratios is None
