"""Unit tests for the drift machinery (checks/drift.py): the RAQC
histogram-space operators in isolation."""

import numpy as np

from raqc_ray.checks.drift import drift_verdicts, ks_stat, moving_window_outlier_bins, psi
from raqc_ray.config import DriftCheck


def test_moving_window_isolated_bin_flagged():
    h = np.zeros((20, 20), dtype=np.int64)
    h[2:8, 2:8] = 100  # dense mass
    h[15, 15] = 3  # isolated occupied bin far from mass
    out = moving_window_outlier_bins(h, window=3, space_threshold=0.16)
    assert out[15, 15]
    assert not out[4, 4]
    assert not out[0, 0]  # unoccupied bins never flagged


def test_moving_window_uniform_has_no_outliers():
    h = np.full((10, 10), 50, dtype=np.int64)
    out = moving_window_outlier_bins(h, window=3, space_threshold=0.16)
    assert not out.any()


def test_moving_window_empty():
    h = np.zeros((5, 5), dtype=np.int64)
    assert not moving_window_outlier_bins(h, 3, 0.16).any()


def test_psi_identical_is_zero():
    rng = np.random.default_rng(1)
    h = rng.integers(0, 100, (10, 10))
    assert psi(h, h) < 1e-9


def test_psi_shift_detected():
    h1 = np.zeros((10, 10))
    h2 = np.zeros((10, 10))
    h1[2, :] = 100
    h2[7, :] = 100
    assert psi(h1, h2) > 1.0


def test_ks_marginal():
    h1 = np.zeros((10, 10))
    h2 = np.zeros((10, 10))
    h1[0:5, :] = 10
    h2[5:10, :] = 10
    assert abs(ks_stat(h1, h2) - 1.0) < 1e-9
    assert ks_stat(h1, h1) == 0.0


def test_drift_verdicts_pass_and_fail():
    rng = np.random.default_rng(2)
    base = {0: np.zeros((10, 10), dtype=np.int64)}
    base[0][0:3, :] = rng.integers(50, 100, (3, 10))  # mass concentrated
    same = {0: base[0] + rng.integers(0, 3, (10, 10))}
    shifted = {0: np.roll(base[0], 5, axis=0)}
    spec = DriftCheck(psi_threshold=0.2, ks_threshold=0.2)
    ok = drift_verdicts(spec, base, same, "e2")
    assert len(ok) == 1 and ok[0]["pass"]
    bad = drift_verdicts(spec, base, shifted, "e2")
    assert len(bad) == 1 and not bad[0]["pass"]
    assert drift_verdicts(spec, {}, shifted, "e2") == []
