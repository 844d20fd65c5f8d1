"""Gates for the RVID scene-cut census (ops/scenecut) and the exact
histogram-L1 drift (ops/histdrift)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raqc_ray.codecs import encode_image
from raqc_ray.ops.histdrift import histogram_l1
from raqc_ray.ops.multimodal import encode_rvid
from raqc_ray.ops.scenecut import frame_mean_cents, scene_cuts, scene_cuts_of


def _gray_frame(v, fmt="ppm", h=8, w=8):
    return encode_image(np.full((h, w, 3), v, dtype=np.uint8), fmt)


def test_frame_mean_cents_exact_for_gray():
    assert frame_mean_cents(_gray_frame(0)) == 0
    assert frame_mean_cents(_gray_frame(137, "png")) == 13700
    # non-uniform: exact rational mean of the cents grid, half-up
    arr = np.zeros((1, 2, 3), dtype=np.uint8)
    arr[0, 1, :] = 1  # cents mean = (0 + 100)/2 = 50
    from raqc_ray.codecs import encode_image as enc
    assert frame_mean_cents(enc(arr, "ppm")) == 50


def test_scene_cuts_closed_form():
    vid = encode_rvid([_gray_frame(10), _gray_frame(15, "png"),
                       _gray_frame(200), _gray_frame(201, "png")])
    # jumps (cents): 500, 18500, 100 -> cuts @ thr 500: only 18500
    assert scene_cuts_of(vid, thr_c=500) == (4, 1, 0, 18500)
    # single frame: no jumps
    assert scene_cuts_of(encode_rvid([_gray_frame(7)]), 500) == \
        (1, 0, 0, 0)
    # frozen-frame run: identical consecutive frames
    frozen = encode_rvid([_gray_frame(50), _gray_frame(50, "png"),
                          _gray_frame(50), _gray_frame(90)])
    assert scene_cuts_of(frozen, thr_c=500) == (4, 1, 2, 4000)


def test_scene_cuts_stage_and_degradation():
    good = encode_rvid([_gray_frame(10), _gray_frame(100)])
    holed = encode_rvid([_gray_frame(10), b"not a frame"])
    ds = rd.from_pandas(pd.DataFrame([
        {"item_id": "a", "bytes": good},
        {"item_id": "b", "bytes": holed},
        {"item_id": "c", "bytes": b"XXXX"},
    ]))
    df = scene_cuts(ds, thr_c=500).to_pandas().set_index("item_id")
    assert bool(df.loc["a", "ok"])
    assert int(df.loc["a", "n_cuts"]) == 1
    assert int(df.loc["a", "n_frozen"]) == 0
    assert int(df.loc["a", "max_jump"]) == 9000
    # a census with holes is not a census — whole video degrades
    assert not bool(df.loc["b", "ok"])
    assert not bool(df.loc["c", "ok"])


def _hist(d):
    return pd.DataFrame({"bin": list(d.keys()),
                         "n_px": list(d.values())})


def test_histogram_l1_closed_form():
    out = histogram_l1(_hist({10: 300, 20: 100}),
                       _hist({10: 100, 30: 100}))
    # Na=400, Nb=200; terms: |300*200-100*400|=20000,
    # |100*200-0|=20000, |0-100*400|=40000 -> 80000 / 80000 = 1.0
    assert out["na_total"].iloc[0] == 400
    assert out["nb_total"].iloc[0] == 200
    assert out["l1_num"].iloc[0] == "80000"
    assert out["l1_den"].iloc[0] == "80000"
    # identical distributions at different scales: zero drift
    z = histogram_l1(_hist({1: 2, 2: 6}), _hist({1: 1, 2: 3}))
    assert z["l1_num"].iloc[0] == "0"


def test_histogram_l1_exact_beyond_int64():
    big = 10 ** 12
    out = histogram_l1(_hist({0: big, 1: big}), _hist({0: 2 * big}))
    # Na=2e12, Nb=2e12; |1e12*2e12 - 2e12*2e12| + |1e12*2e12 - 0|
    assert out["l1_num"].iloc[0] == str(4 * big * big)
    assert out["l1_den"].iloc[0] == str(4 * big * big)


def test_histogram_l1_empty_raises():
    with pytest.raises(ValueError):
        histogram_l1(_hist({}), _hist({1: 1}))
