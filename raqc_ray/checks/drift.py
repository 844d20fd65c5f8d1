"""Distribution-drift verdicts between repeat epochs (SURVEY.md §2.9 F1).

The direct RAQC port in histogram space: Pass A's per-partition 2-D
histogram partials (fixed bins shared across epochs, exactly as RAQC fixes
``[histogram_outliers] num_bins`` so repeat histograms align) are merged
per epoch; then, all driver-side on tiny ``bins×bins`` matrices:

- **Outlier bins** — RAQC's moving-window scan over histogram space
  (``[R] raqc/multi_array.py :: outliers_hist + PatternFilters.mov_wind2
  (rec., H)``): an occupied bin whose windowed neighborhood holds less than
  ``space_threshold`` of uniform window mass is an outlier bin; each
  partition's count of rows in outlier bins is reported.
- **PSI** (population stability index, standard banking/industry formula
  Σ (p−q)·ln(p/q) with epsilon floors) per later-epoch partition vs the
  earlier epoch's merged histogram → pass/fail at ``psi_threshold``.
- **KS** statistic on the x-marginal CDFs (reported in stats_json).

This mirrors RAQC's design point: the model state (histogram) is tiny even
at 10^12 rows — only the partials shuffle, never the data.
"""

from __future__ import annotations

import json

import numpy as np

from ..config import DriftCheck


def moving_window_outlier_bins(hist: np.ndarray, window: int, space_threshold: float
                               ) -> np.ndarray:
    """Boolean mask of outlier bins: occupied bins in locally-sparse
    neighborhoods.  Vectorized via a summed-area table (the same
    idea as RAQC's ``mov_wind2`` vectorization of a slow generic filter)."""
    h = hist.astype(np.float64)
    total = h.sum()
    if total == 0:
        return np.zeros_like(hist, dtype=bool)
    k = window // 2
    padded = np.pad(h, k, mode="constant")
    sat = padded.cumsum(0).cumsum(1)
    sat = np.pad(sat, ((1, 0), (1, 0)), mode="constant")
    n0, n1 = hist.shape
    win = (
        sat[window : window + n0, window : window + n1]
        - sat[:n0, window : window + n1]
        - sat[window : window + n0, :n1]
        + sat[:n0, :n1]
    )
    # fraction of the window's mass, normalized to a uniform expectation
    expected = total * (window * window) / hist.size
    frac = win / max(expected, 1e-12)
    return (hist > 0) & (frac < space_threshold)


def psi(p_counts: np.ndarray, q_counts: np.ndarray, eps: float = 1e-6) -> float:
    p = p_counts.astype(np.float64).ravel()
    q = q_counts.astype(np.float64).ravel()
    p = np.maximum(p / max(p.sum(), 1e-12), eps)
    q = np.maximum(q / max(q.sum(), 1e-12), eps)
    p, q = p / p.sum(), q / q.sum()
    return float(np.sum((p - q) * np.log(p / q)))


def ks_stat(p_counts: np.ndarray, q_counts: np.ndarray) -> float:
    """KS on the x-marginal (axis-0 sums of the 2-D histogram)."""
    p = p_counts.sum(axis=1).astype(np.float64)
    q = q_counts.sum(axis=1).astype(np.float64)
    pc_ = np.cumsum(p) / max(p.sum(), 1e-12)
    qc = np.cumsum(q) / max(q.sum(), 1e-12)
    return float(np.max(np.abs(pc_ - qc)))


def drift_verdicts(
    spec: DriftCheck,
    baseline_hists: dict[int, np.ndarray],
    current_hists: dict[int, np.ndarray],
    current_epoch: str,
) -> list[dict]:
    """Per-(current-epoch partition) drift verdicts vs the baseline epoch's
    merged histogram.  All inputs are tiny driver-side matrices."""
    if not baseline_hists or not current_hists:
        return []
    base = sum(baseline_hists.values())
    combined = base + sum(current_hists.values())
    outliers = moving_window_outlier_bins(
        combined, spec.moving_window, spec.space_threshold
    )
    rows = []
    for pid in sorted(current_hists):
        h = current_hists[pid]
        p = psi(h, base)
        k = ks_stat(h, base)
        n_outlier_rows = int(h[outliers].sum())
        n_rows = int(h.sum())
        rows.append(
            {
                "partition_id": pid,
                "epoch": current_epoch,
                "check": "drift",
                "pass": bool(p < spec.psi_threshold and k < spec.ks_threshold),
                "n_rows": n_rows,
                "n_violations": n_outlier_rows,
                "stats_json": json.dumps(
                    {"psi": round(p, 6), "ks": round(k, 6),
                     "n_outlier_bins": int(outliers.sum()),
                     "rows_in_outlier_bins": n_outlier_rows},
                    sort_keys=True,
                ),
            }
        )
    return rows
