"""Gates for the DC-only JPEG triage stage: the DC grid equals the
full-decode block means within quantization, the ppm fallback is
exact, errors degrade per-row, and the stage is layout-invariant."""

import numpy as np
import pyarrow as pa

from raqc_ray.codecs import encode_image, synth_image
from raqc_ray.jpeg import decode_jpeg, encode_jpeg
from raqc_ray.jpegdc import decode_jpeg_dc
from raqc_ray.ops.dcstats import block_means_full, dc_stats


def _img(seed, w=64, h=48):
    return synth_image(np.random.default_rng(seed), w, h)


def test_dc_grid_constant_images_exact():
    for c in (0, 37, 128, 220, 255):
        arr = np.full((24, 40, 3), c, dtype=np.uint8)
        m = decode_jpeg_dc(encode_jpeg(arr, quality=92))
        assert m.shape == (3, 5)
        # DC quantization error bound: one half quant step / 8... the
        # encoder rounds DC to the nearest step, so the grid is within
        # q00/16 of the true mean; q92's luma DC step is small
        assert np.abs(m - float(c)).max() <= 1.0
        assert np.ptp(m) == 0.0  # flat image -> flat grid


def test_dc_grid_matches_full_decode_block_means():
    for seed in (3, 11):
        data = encode_jpeg(_img(seed), quality=92)
        m = decode_jpeg_dc(data)
        full = decode_jpeg(data)
        fm = block_means_full(full)
        assert m.shape == fm.shape
        # AC basis functions are zero-mean, so the only divergence is
        # the full path's uint8 round + clip (< 1 luma level)
        assert np.abs(m - fm).max() < 1.5


def test_dc_grid_restart_markers():
    # encoder may or may not emit DRI; force a multi-MCU image and
    # check self-consistency through the full decoder instead
    data = encode_jpeg(_img(19, w=96, h=64), quality=85)
    m = decode_jpeg_dc(data)
    fm = block_means_full(decode_jpeg(data))
    assert np.abs(m - fm).max() < 1.5


def _table(rows):
    return pa.table({
        "image_id": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
        "fmt": pa.array([r[2] for r in rows], pa.string()),
    })


def test_dc_stats_stage_jpeg_and_fallback(ray_session):
    import ray.data as rd

    arrs = {f"img-{s}": _img(s) for s in range(6)}
    rows = []
    for i, (iid, arr) in enumerate(arrs.items()):
        fmt = "jpeg" if i % 2 == 0 else "ppm"
        data = (encode_jpeg(arr, quality=92) if fmt == "jpeg"
                else encode_image(arr, fmt))
        rows.append((iid, data, fmt))
    rows.append(("bad-1", b"\x00\x01not an image", "jpeg"))
    ds = rd.from_arrow(_table(rows)).repartition(3)
    out = dc_stats(ds).to_pandas().set_index("image_id")
    assert not out.loc["bad-1", "ok"]
    assert out.loc["bad-1", "error"].startswith("DecodeError")
    for i, (iid, arr) in enumerate(arrs.items()):
        r = out.loc[iid]
        assert r["ok"]
        ref = block_means_full(arr)
        ref_c = np.floor(ref.ravel() * 100 + 0.5).astype(np.int64)
        assert r["n_blocks"] == ref.size
        if i % 2 == 1:  # ppm fallback: exact integer equality
            assert r["sum_c"] == ref_c.sum()
            assert r["min_c"] == ref_c.min()
            assert r["max_c"] == ref_c.max()
        else:  # jpeg: within quantization of the reference grid
            assert abs(r["sum_c"] - ref_c.sum()) <= 150 * ref.size
            assert abs(r["min_c"] - ref_c.min()) <= 300
            assert abs(r["max_c"] - ref_c.max()) <= 300


def test_dc_stats_layout_invariant(ray_session):
    import ray.data as rd

    rows = [(f"i{s}", encode_jpeg(_img(s), quality=92), "jpeg")
            for s in range(5)]
    frames = []
    for blocks in (1, 4):
        ds = rd.from_arrow(_table(rows)).repartition(blocks)
        frames.append(dc_stats(ds).to_pandas()
                      .sort_values("image_id").reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(frames[0], frames[1])
