"""S8 plot writer: shape/value invariants (not correctness-gated)."""

import numpy as np
import pandas as pd

from raqc_ray.codecs import decode_ppm
from raqc_ray.plots import render_flag_map, render_hist2d, write_epoch_plots


def test_hist2d_render_shape_and_peak():
    hist = np.zeros((20, 20))
    hist[3, 7] = 1000
    hist[10, 10] = 10
    img = decode_ppm(render_hist2d(hist, scale=8))
    assert img.shape == (160, 160, 3)
    # peak bin renders the ramp's brightest color, empty bins the darkest
    assert tuple(img[3 * 8, 7 * 8]) == (240, 249, 33)
    assert tuple(img[0, 0]) == (13, 8, 135)


def test_flag_map_colors():
    vdf = pd.DataFrame(
        {"partition_id": [0, 0, 1], "check": ["nullity", "range", "nullity"],
         "pass": [True, False, True]}
    )
    data, checks, pids = render_flag_map(vdf, cell=4)
    img = decode_ppm(data)
    assert checks == ["nullity", "range"] and pids == [0, 1]
    assert img.shape == (2 * 4, 2 * 4, 3)
    assert tuple(img[0, 0]) == (46, 160, 67)      # p0 nullity pass
    assert tuple(img[0, 4]) == (218, 54, 51)      # p0 range fail
    assert tuple(img[4, 4]) == (110, 118, 129)    # p1 range absent


def test_write_epoch_plots(tmp_path):
    import pickle

    import pyarrow as pa

    class R:
        epoch = "e1"

        def hists(self):
            rng = np.random.default_rng(1)
            return {0: rng.integers(0, 50, (20, 20)),
                    1: rng.integers(0, 50, (20, 20))}

        verdicts = pa.table(
            {"partition_id": pa.array([0, 1], pa.int64()),
             "epoch": pa.array(["e1", "e1"]),
             "check": pa.array(["nullity", "nullity"]),
             "pass": pa.array([True, False])}
        )

    paths = write_epoch_plots(R(), str(tmp_path))
    names = sorted(p.rsplit("/", 1)[1] for p in paths)
    assert names == ["flag-map.ppm", "hist2d-merged.ppm",
                     "hist2d-part-00000.ppm", "hist2d-part-00001.ppm"]
    for p in paths:
        img = decode_ppm(open(p, "rb").read())
        assert img.ndim == 3 and img.shape[2] == 3
