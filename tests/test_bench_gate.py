"""The bench regression gate's decision logic (bench.py env_scale /
_violations / the env-control divergence guard) — pure functions over the
recorded budgets file, no Spark needed.

The gate is load-bearing: the driver's per-round BENCH artifact records
``budget_violations`` from these functions, so their behavior under the
three environment profiles (quiet box, uniform tenant burst, broad code
regression) is pinned here.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def _gate():
    return {
        "budgets": {"a": 2.0, "b": 2.0, "c": 6.0, "d": 3.0, "e": 2.0},
        "mins": {"a": 0.4, "b": 0.9, "c": 4.0, "d": 2.0, "e": 1.2},
        "control_min": 0.5,
    }


def _clean():
    # every query at its recorded clean min
    return dict(_gate()["mins"])


def test_clean_run_scale_one_no_violations():
    gate = _gate()
    out = _clean()
    assert bench.env_scale(out, gate) == 1.0
    assert bench._violations(out, gate) == {}


def test_uniform_slowdown_clears_and_scale_is_exact():
    """A uniformly 2x-slow box must read env_scale == 2.0 exactly — the
    round-5 fix: ratios divide by the RAW mins, not budgets/1.5, which
    the 2s budget floor distorts for fast queries (a/b/e here)."""
    gate = _gate()
    out = {k: v * 2.0 for k, v in _clean().items()}
    assert bench.env_scale(out, gate) == 2.0
    assert bench._violations(out, gate) == {}


def test_single_regression_flags_through_any_env():
    """One query 4x over its min stays flagged whether the box is quiet
    or uniformly 1.5x slow — the median is anchored by the other four."""
    gate = _gate()
    for env in (1.0, 1.5):
        out = {k: v * env for k, v in _clean().items()}
        out["c"] = 4.0 * 4 * env  # 4x the min, scaled by the env too
        v = bench._violations(out, gate)
        assert list(v) == ["c"], (env, v)


def test_legacy_file_without_mins_falls_back():
    gate = {"budgets": {"a": 3.0}, "mins": {}}
    # min reconstructed as 3.0/1.5 = 2.0
    assert bench.env_scale({"a": 4.0}, gate) == 2.0


def test_broad_regression_is_unexplained_by_the_control():
    """Half the suite slowing together raises the median (so normalized
    violations stay empty — by design, that is what absorbs real tenant
    bursts), but the pure-JVM control does not move: the divergence
    predicate used in bench.main must fire."""
    gate = _gate()
    out = {k: v * 2.0 for k, v in _clean().items()}  # looks uniform
    scale = bench.env_scale(out, gate)
    assert bench._violations(out, gate) == {}
    control_ratio = 1.0  # the box is actually quiet
    assert scale > control_ratio * 1.25 + 0.15  # -> budget_env_unexplained
    # and the same predicate stays quiet when the control moved too
    burst_ratio = 2.0
    assert not scale > burst_ratio * 1.25 + 0.15
