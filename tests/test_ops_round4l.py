"""Gates for the round-4 session-f image stages: exposure/contrast
census (ops/exposure) and letterbox border detection (ops/border) —
closed-form planted arrays through the REAL encode → decode → stage
path, per-row error degradation, and both lossless codec branches."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raqc_ray.codecs import encode_image
from raqc_ray.ops.border import BorderStage, border_stats, border_widths_of
from raqc_ray.ops.exposure import (ExposureStage, exposure_stats,
                                   pixel_stats_of)


def _imgs_ds(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_pixel_stats_closed_form_gray():
    # two-tone gray: luma cents are exactly 100*v
    arr = np.empty((16, 32, 3), dtype=np.uint8)
    arr[:, :16, :] = 10
    arr[:, 16:, :] = 240
    n, s, ss, lo, hi = pixel_stats_of(arr, lo_c=2000, hi_c=23500)
    assert n == 512
    assert s == 256 * (1000 + 24000)
    assert ss == 256 * (1000 ** 2 + 24000 ** 2)
    assert lo == 256 and hi == 256
    # exact population-variance numerator in cents^2
    assert n * ss - s * s == 256 * 256 * (24000 - 1000) ** 2


def test_pixel_stats_color_luma_rounding():
    # non-gray pixel: floor(luma*100 + 0.5) per pixel
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    # pure red: 255*0.299 in float64 is 76.24499999999999, so the
    # floor(x*100 + 0.5) cents round DOWN to 7624 — pinned here so a
    # luma-weight change can't silently shift every downstream stat
    arr[..., 0] = 255
    n, s, ss, lo, hi = pixel_stats_of(arr, lo_c=2000, hi_c=23500)
    assert (n, s, ss) == (4, 4 * 7624, 4 * 7624 ** 2)
    assert lo == 0 and hi == 0


def test_exposure_stage_roundtrip_both_codecs_and_errors():
    arr = np.full((8, 8, 3), 77, dtype=np.uint8)
    ds = _imgs_ds([
        {"image_id": "a", "bytes": encode_image(arr, "ppm"),
         "fmt": "ppm"},
        {"image_id": "b", "bytes": encode_image(arr, "png"),
         "fmt": "png"},
        {"image_id": "c", "bytes": b"not an image", "fmt": "png"},
    ])
    df = (exposure_stats(ds, batch_size=2).to_pandas()
          .set_index("image_id").sort_index())
    for k in ("a", "b"):
        assert bool(df.loc[k, "ok"])
        assert int(df.loc[k, "n_px"]) == 64
        assert int(df.loc[k, "sum_c"]) == 64 * 7700
        assert int(df.loc[k, "sumsq_c"]) == 64 * 7700 ** 2
    assert not bool(df.loc["c", "ok"])
    assert "Error" in str(df.loc["c", "error"])


def _bordered(t, b, le, r, h=20, w=24, v1=60):
    yy, xx = np.mgrid[0:h, 0:w]
    content = (v1 + 50 * ((yy + xx) % 2)).astype(np.uint8)
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[t:h - b, le:w - r, :] = content[t:h - b, le:w - r, None]
    return arr


def test_border_widths_planted():
    for t, b, le, r in [(0, 0, 0, 0), (3, 1, 0, 5), (2, 2, 4, 4),
                        (0, 4, 3, 0)]:
        assert border_widths_of(_bordered(t, b, le, r)) == (t, b, le, r)


def test_border_widths_uniform_image_full_dims():
    arr = np.full((6, 9, 3), 123, dtype=np.uint8)
    assert border_widths_of(arr) == (6, 6, 9, 9)


def test_border_widths_nonblack_bars():
    # bars any constant color, not just black
    arr = _bordered(2, 3, 1, 2)
    arr[:2], arr[-3:] = 200, 200
    arr[:, :1], arr[:, -2:] = 200, 200
    assert border_widths_of(arr) == (2, 3, 1, 2)


def test_border_stage_roundtrip_and_errors():
    a = _bordered(2, 1, 3, 0)
    ds = _imgs_ds([
        {"image_id": "x", "bytes": encode_image(a, "png"),
         "fmt": "png"},
        {"image_id": "y", "bytes": encode_image(a, "ppm"),
         "fmt": "ppm"},
        {"image_id": "z", "bytes": b"\x00\x01", "fmt": "ppm"},
    ])
    df = (border_stats(ds, batch_size=2).to_pandas()
          .set_index("image_id").sort_index())
    for k in ("x", "y"):
        assert bool(df.loc[k, "ok"])
        assert (int(df.loc[k, "h"]), int(df.loc[k, "w"])) == (20, 24)
        assert [int(df.loc[k, c]) for c in
                ("top", "bottom", "left", "right")] == [2, 1, 3, 0]
    assert not bool(df.loc["z", "ok"])


def test_stages_layout_invariant():
    # same rows, different block layouts -> identical sorted output
    rng = np.random.default_rng(7)
    rows = []
    for i in range(12):
        arr = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
        rows.append({"image_id": str(i),
                     "bytes": encode_image(arr, "png"), "fmt": "png"})
    base = None
    for nblocks in (1, 4):
        ds = _imgs_ds(rows).repartition(nblocks)
        e = (exposure_stats(ds).to_pandas()
             .sort_values("image_id").reset_index(drop=True))
        b = (border_stats(ds).to_pandas()
             .sort_values("image_id").reset_index(drop=True))
        cur = (e.drop(columns=["error"]), b.drop(columns=["error"]))
        if base is None:
            base = cur
        else:
            assert base[0].equals(cur[0]) and base[1].equals(cur[1])
