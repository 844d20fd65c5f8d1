"""Per-row invariant vs the generator's ground truth (BASELINE.json:15):
decoded pixels byte-equal for lossless formats (PSNR >= 40 dB applies only
to lossy formats, none of which are enabled in this sandbox)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from raqc_ray.codecs import decode_image, psnr


def _rows_by_id(root, epoch):
    d = os.path.join(root, epoch)
    out = {}
    for f in sorted(os.listdir(d)):
        if not f.startswith("part-"):
            continue
        t = pq.read_table(os.path.join(d, f), columns=["image_id", "bytes", "fmt"])
        for iid, b, fmt in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist(),
                               t["fmt"].to_pylist()):
            out[iid] = (b, fmt)
    return out


@pytest.mark.parametrize("epoch", ["e1", "e2"])
def test_decoded_pixels_match_ground_truth(t1_fixture, epoch):
    root = t1_fixture["root"]
    pix_dir = os.path.join(root, "expected", "pixels", epoch)
    rows = _rows_by_id(root, epoch)
    files = sorted(os.listdir(pix_dir))
    assert len(files) >= 30
    checked = 0
    for f in files:
        iid = f[: -len(".npy")]
        expected = np.load(os.path.join(pix_dir, f))
        b, fmt = rows[iid]
        img = decode_image(b, fmt)
        if fmt in ("ppm", "png"):
            assert np.array_equal(img, expected), iid  # lossless ⇒ exact
        else:
            assert psnr(img, expected) >= 40.0, iid  # lossy invariant
        checked += 1
    assert checked == len(files)
