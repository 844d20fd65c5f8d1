"""Gates for the round-4 session-f image stages #2: per-image color
census (ops/color) and Laplacian sharpness census (ops/sharpness) —
closed-form planted arrays through the REAL encode → decode → stage
path, per-row error degradation, and both lossless codec branches."""

import numpy as np
import pandas as pd
import ray.data as rd

from raqc_ray.codecs import encode_image
from raqc_ray.ops.color import color_census, color_census_of
from raqc_ray.ops.sharpness import sharpness_of, sharpness_stats


def _imgs_ds(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_color_census_closed_form():
    # left half gray 80, right half color (200, 40, 120)
    arr = np.empty((4, 8, 3), dtype=np.uint8)
    arr[:, :4, :] = 80
    arr[:, 4:, 0] = 200
    arr[:, 4:, 1] = 40
    arr[:, 4:, 2] = 120
    n, sr, sg, sb, ngray, ncol, sat = color_census_of(arr)
    assert n == 32
    assert (sr, sg, sb) == (16 * 80 + 16 * 200,
                            16 * 80 + 16 * 40,
                            16 * 80 + 16 * 120)
    assert ngray == 16
    assert ncol == 2
    assert sat == 16 * (200 - 40)


def test_color_census_all_gray_single_color():
    arr = np.full((5, 7, 3), 33, dtype=np.uint8)
    n, sr, sg, sb, ngray, ncol, sat = color_census_of(arr)
    assert (n, ngray, ncol, sat) == (35, 35, 1, 0)
    assert sr == sg == sb == 35 * 33


def test_color_census_palette_counts_distinct_triples():
    # four distinct colors, one repeated — unique must see 4
    px = np.array([[1, 2, 3], [1, 2, 3], [3, 2, 1],
                   [0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    arr = px.reshape(1, 5, 3)
    assert color_census_of(arr)[5] == 4


def test_color_stage_roundtrip_and_errors():
    arr = np.empty((4, 4, 3), dtype=np.uint8)
    arr[..., 0] = 10
    arr[..., 1] = 20
    arr[..., 2] = 30
    ds = _imgs_ds([
        {"image_id": "a", "bytes": encode_image(arr, "ppm"),
         "fmt": "ppm"},
        {"image_id": "b", "bytes": encode_image(arr, "png"),
         "fmt": "png"},
        {"image_id": "c", "bytes": b"junk", "fmt": "ppm"},
    ])
    df = (color_census(ds, batch_size=2).to_pandas()
          .set_index("image_id").sort_index())
    for k in ("a", "b"):
        assert bool(df.loc[k, "ok"])
        assert int(df.loc[k, "n_gray"]) == 0
        assert int(df.loc[k, "n_colors"]) == 1
        assert int(df.loc[k, "sat_sum"]) == 16 * 20
    assert not bool(df.loc["c", "ok"])


def test_sharpness_closed_form_two_tone():
    # vertical seam at x=4 in an 8-wide, 6-tall gray pair (30 | 90):
    # interior rows 1..4 (4 rows), lap = 100*|30-90| at x=3 and x=4
    arr = np.empty((6, 8, 3), dtype=np.uint8)
    arr[:, :4, :] = 30
    arr[:, 4:, :] = 90
    n_int, lap, n_edge = sharpness_of(arr, thr_c=500)
    assert n_int == 4 * 6
    assert lap == 4 * 2 * 100 * 60
    assert n_edge == 8
    # below-threshold seam: |30-31| = 100 cents < 500
    arr[:, 4:, :] = 31
    n_int, lap, n_edge = sharpness_of(arr, thr_c=500)
    assert (lap, n_edge) == (4 * 2 * 100, 0)


def test_sharpness_flat_and_tiny():
    assert sharpness_of(np.full((9, 9, 3), 50, np.uint8), 500) == \
        (49, 0, 0)
    # no interior below 3x3
    assert sharpness_of(np.full((2, 8, 3), 50, np.uint8), 500) == \
        (0, 0, 0)


def test_sharpness_checkerboard_closed_form():
    # checkerboard 0/200: every interior pixel has 4 opposite
    # neighbors → lap = 8 * 100 * 200 at value-0 pixels and
    # 4*20000 - ... symmetric: |4c - 4*other| = 4*|c-other| in cents
    yy, xx = np.mgrid[0:6, 0:6]
    arr = (200 * ((yy + xx) % 2)).astype(np.uint8)[..., None].repeat(
        3, axis=2)
    n_int, lap, n_edge = sharpness_of(arr, thr_c=500)
    assert n_int == 16
    assert lap == 16 * 4 * 100 * 200
    assert n_edge == 16


def test_sharpness_stage_roundtrip_and_errors():
    arr = np.empty((6, 8, 3), dtype=np.uint8)
    arr[:, :4, :] = 10
    arr[:, 4:, :] = 110
    ds = _imgs_ds([
        {"image_id": "a", "bytes": encode_image(arr, "png"),
         "fmt": "png"},
        {"image_id": "b", "bytes": b"\x00\x01", "fmt": "png"},
    ])
    df = (sharpness_stats(ds, batch_size=2).to_pandas()
          .set_index("image_id").sort_index())
    assert bool(df.loc["a", "ok"])
    assert int(df.loc["a", "lap_sum_c"]) == 4 * 2 * 100 * 100
    assert int(df.loc["a", "n_edge"]) == 8
    assert not bool(df.loc["b", "ok"])
