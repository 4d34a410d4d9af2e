"""Unit tests for bench.py's regression guard — pure-Python, no Spark.

The guard normalizes per-query ratios by the session-median ratio
(host-drift absorption), which makes it blind to a regression hitting
>= half the queries; the DRIFT_BACKSTOP flag exists to catch exactly
that case.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import DRIFT_BACKSTOP, compute_regression_flags  # noqa: E402

PRIOR = {f"q{i}": 1.0 for i in range(10)}


def test_no_change_no_flags():
    flags = compute_regression_flags(dict(PRIOR), PRIOR)
    assert flags["regressions"] == {}
    assert flags["host_drift_factor"] == 1.0
    assert not flags["drift_backstop_exceeded"]
    assert flags["uniform_slowdown_raw"] == {}


def test_localized_regression_flagged():
    medians = dict(PRIOR)
    medians["q3"] = 1.6  # one query 60% slower, the rest flat
    flags = compute_regression_flags(medians, PRIOR)
    assert list(flags["regressions"]) == ["q3"]
    assert flags["host_drift_factor"] == 1.0
    assert not flags["drift_backstop_exceeded"]


def test_host_drift_absorbs_moderate_uniform_shift():
    # everything 15% slower — classic co-tenant contention, below the
    # backstop: absorbed, recorded in the factor, no false flags
    medians = {n: v * 1.15 for n, v in PRIOR.items()}
    flags = compute_regression_flags(medians, PRIOR)
    assert flags["regressions"] == {}
    assert 1.1 < flags["host_drift_factor"] < 1.2
    assert not flags["drift_backstop_exceeded"]


def test_uniform_genuine_regression_trips_backstop():
    # EVERY query 50% slower (e.g. a session-conf regression): the
    # normalization zeroes the per-query flags — the backstop must fire
    # and list the raw-slow queries so the run cannot read as clean
    medians = {n: v * 1.5 for n, v in PRIOR.items()}
    flags = compute_regression_flags(medians, PRIOR)
    assert flags["regressions"] == {}  # the blindness being backstopped
    assert flags["host_drift_factor"] > DRIFT_BACKSTOP
    assert flags["drift_backstop_exceeded"]
    assert set(flags["uniform_slowdown_raw"]) == set(PRIOR)


def test_first_round_without_prior_is_silent():
    flags = compute_regression_flags(dict(PRIOR), {})
    assert flags["regressions"] == {}
    assert flags["host_drift_factor"] == 1.0
    assert not flags["drift_backstop_exceeded"]
