"""Plot writer (SURVEY.md §2.1 S8 — ``[R] raqc/plotables.py (rec.)``).

RAQC renders its change histograms and flag maps to PNG via matplotlib;
the sandbox has no plotting stack, so the same artifacts render to
standalone image files through the engine's own codecs (codecs.py):

- ``render_hist2d``  — the per-partition / merged 2-D change histogram
  (A1) as a log-scaled false-color PPM (the ``plot_basin_change`` analog).
- ``render_flag_map`` — partitions × checks pass/fail grid (the flag-tiff
  quicklook analog): green pass, red fail, gray absent.
- ``write_epoch_plots`` — one histogram per partition + the global merge
  + the flag map, written under ``<out_dir>/plots/<epoch>/``.

Outputs are plain P6 PPM (viewable everywhere, zero deps); a PNG variant
is one ``codecs.encode_png`` call away and used when smaller files
matter.  Not correctness-gated (SURVEY declares S8 non-gated); tested
for shape/value invariants in tests/test_plots.py.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from .codecs import encode_png, encode_ppm

# 5-anchor false-color ramp (dark → bright), linearly interpolated
_RAMP = np.array(
    [[13, 8, 135], [126, 3, 168], [204, 71, 120], [248, 149, 64],
     [240, 249, 33]], dtype=np.float64)


def _colorize(norm: np.ndarray) -> np.ndarray:
    """(h, w) values in [0, 1] → (h, w, 3) uint8 via the ramp."""
    x = np.clip(norm, 0.0, 1.0) * (len(_RAMP) - 1)
    lo = np.floor(x).astype(np.int64)
    hi = np.minimum(lo + 1, len(_RAMP) - 1)
    frac = (x - lo)[..., None]
    rgb = _RAMP[lo] * (1 - frac) + _RAMP[hi] * frac
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def render_hist2d(hist: np.ndarray, scale: int = 8, fmt: str = "ppm") -> bytes:
    """2-D count histogram → log-scaled false-color image bytes.

    ``scale`` upsamples each bin to a scale×scale pixel block so a 20×20
    histogram is a legible 160×160 image."""
    h = np.asarray(hist, dtype=np.float64)
    logc = np.log1p(h)
    peak = logc.max()
    norm = logc / peak if peak > 0 else logc
    img = _colorize(norm)
    img = np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)
    return encode_ppm(img) if fmt == "ppm" else encode_png(img)


_PASS = np.array([46, 160, 67], dtype=np.uint8)    # green
_FAIL = np.array([218, 54, 51], dtype=np.uint8)    # red
_NONE = np.array([110, 118, 129], dtype=np.uint8)  # gray


def render_flag_map(verdicts_df, cell: int = 16, fmt: str = "ppm"
                    ) -> tuple[bytes, list[str], list[int]]:
    """Verdicts table → (image bytes, check order, partition order).

    One row per partition, one column per check; green pass / red fail /
    gray when the (partition, check) cell has no verdict."""
    checks = sorted(verdicts_df["check"].unique())
    pids = sorted(int(p) for p in verdicts_df["partition_id"].unique())
    grid = np.tile(_NONE, (len(pids), len(checks), 1))
    pidx = {p: i for i, p in enumerate(pids)}
    cidx = {c: j for j, c in enumerate(checks)}
    for _, r in verdicts_df.iterrows():
        i, j = pidx[int(r["partition_id"])], cidx[r["check"]]
        grid[i, j] = _PASS if bool(r["pass"]) else _FAIL
    img = np.repeat(np.repeat(grid, cell, axis=0), cell, axis=1)
    # 1-px separator lines between cells for legibility
    img[cell - 1::cell, :, :] = 32
    img[:, cell - 1::cell, :] = 32
    data = encode_ppm(img) if fmt == "ppm" else encode_png(img)
    return data, checks, pids


def write_epoch_plots(result, out_dir: str, fmt: str = "ppm") -> list[str]:
    """Render an EpochResult's plottables (RAQC writes its PNGs beside the
    flag tiffs; same layout here).  Returns the written paths."""
    epoch = result.epoch
    d = os.path.join(out_dir, "plots", epoch)
    os.makedirs(d, exist_ok=True)
    written: list[str] = []

    hists = result.hists()
    for pid, hist in sorted(hists.items()):
        p = os.path.join(d, f"hist2d-part-{pid:05d}.{fmt}")
        with open(p, "wb") as f:
            f.write(render_hist2d(hist, fmt=fmt))
        written.append(p)
    if hists:
        merged = np.sum([np.asarray(h, dtype=np.float64)
                         for h in hists.values()], axis=0)
        p = os.path.join(d, f"hist2d-merged.{fmt}")
        with open(p, "wb") as f:
            f.write(render_hist2d(merged, fmt=fmt))
        written.append(p)

    vdf = result.verdicts.to_pandas()
    if len(vdf):
        data, checks, pids = render_flag_map(vdf, fmt=fmt)
        p = os.path.join(d, f"flag-map.{fmt}")
        with open(p, "wb") as f:
            f.write(data)
        with open(os.path.join(d, "flag-map.legend.txt"), "w") as f:
            f.write("rows (partitions): " + ", ".join(map(str, pids)) + "\n")
            f.write("cols (checks): " + ", ".join(checks) + "\n")
        written.append(p)
    return written
