"""Gates for the pixel-level moving-window neighbor filter
(ops/movwind) — the signature RAQC operator at its original
granularity: exact integral-image box sums (brute-force equivalence,
edge clipping), speckle-dies/block-survives semantics, the exact
rational threshold tie, and the stage roundtrip."""

import numpy as np
import pandas as pd
import ray.data as rd

from raqc_ray.codecs import encode_image
from raqc_ray.ops.movwind import box_sums, mov_wind_flags, mov_wind_of


def _brute_box(mask, k):
    h, w = mask.shape
    r = k // 2
    s = np.zeros((h, w), dtype=np.int64)
    a = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            win = mask[max(y - r, 0):y + r + 1, max(x - r, 0):x + r + 1]
            s[y, x] = win.sum()
            a[y, x] = win.size
    return s, a


def test_box_sums_match_brute_force_with_edges():
    rng = np.random.default_rng(7)
    for k in (3, 5):
        mask = rng.random((11, 14)) < 0.3
        s, a = box_sums(mask, k)
        bs, ba = _brute_box(mask, k)
        assert (s == bs).all() and (a == ba).all()


def _img(h=16, w=32, bg=100):
    return np.full((h, w, 3), bg, dtype=np.uint8)


def test_block_survives_speckle_dies():
    arr = _img()
    arr[4:9, 2:8, :] = 250          # 5x6 hot rectangle
    arr[1, 20, :] = 250             # isolated speckles
    arr[1, 28, :] = 250
    n_px, n_flag, n_kept = mov_wind_of(arr, k=3, num=4, den=9,
                                       lo_c=2000, hi_c=23500)
    assert n_px == 512
    assert n_flag == 30 + 2
    assert n_kept == 30              # every rect pixel, no speckle


def test_threshold_tie_is_kept_and_low_end_flags():
    # rect CORNER has boxsum 4 of area 9 — exactly num/den = 4/9
    arr = _img()
    arr[4:7, 4:7, :] = 0             # dark block flags via lo_c
    assert mov_wind_of(arr, 3, 4, 9, 2000, 23500) == (512, 9, 9)
    # raise the bar past the corner fraction: corners die (4/9 < 5/9),
    # edges (6/9) and center (9/9) survive
    assert mov_wind_of(arr, 3, 5, 9, 2000, 23500)[2] == 5


def test_image_corner_window_clips_exactly():
    # 2x2 flagged block in the image corner: the corner pixel's
    # window clips to area 4 with boxsum 4 → survives even at
    # threshold 8/9 (a full-size window would give 4/9)
    arr = _img(h=8, w=8)
    arr[:2, :2, :] = 250
    assert mov_wind_of(arr, 3, 8, 9, 2000, 23500)[2] >= 1
    n_px, n_flag, n_kept = mov_wind_of(arr, 3, 1, 9, 2000, 23500)
    assert (n_flag, n_kept) == (4, 4)


def test_movwind_stage_roundtrip_and_errors():
    arr = _img()
    arr[4:9, 2:8, :] = 250
    ds = rd.from_pandas(pd.DataFrame([
        {"image_id": "a", "bytes": encode_image(arr, "ppm"),
         "fmt": "ppm"},
        {"image_id": "b", "bytes": encode_image(arr, "png"),
         "fmt": "png"},
        {"image_id": "c", "bytes": b"rot", "fmt": "png"},
    ]))
    df = (mov_wind_flags(ds, batch_size=2).to_pandas()
          .set_index("image_id").sort_index())
    for k in ("a", "b"):
        assert bool(df.loc[k, "ok"])
        assert int(df.loc[k, "n_flag"]) == 30
        assert int(df.loc[k, "n_kept"]) == 30
    assert not bool(df.loc["c", "ok"])
