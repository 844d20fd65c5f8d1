"""Gates for the corpus luma histogram (ops/lumahist) and the
cross-epoch tile change localization (ops/tilediff)."""

import numpy as np
import pandas as pd
import ray.data as rd

from raqc_ray.codecs import encode_image
from raqc_ray.ops.lumahist import luma_bins_of, luma_histogram
from raqc_ray.ops.tilediff import tile_changes, tile_means, tile_sums_of


def _two_tone(g1, g2, h=16, w=32):
    a = np.empty((h, w, 3), np.uint8)
    a[:, :w // 2, :] = g1
    a[:, w // 2:, :] = g2
    return a


def test_luma_bins_closed_form():
    bins, counts = luma_bins_of(_two_tone(10, 200))
    assert bins.tolist() == [10, 200]
    assert counts.tolist() == [256, 256]


def test_luma_histogram_corpus_sum_and_skip():
    rows = [
        {"image_id": "a", "bytes": encode_image(_two_tone(10, 200),
                                                "ppm"), "fmt": "ppm"},
        {"image_id": "b", "bytes": encode_image(_two_tone(10, 50),
                                                "png"), "fmt": "png"},
        {"image_id": "c", "bytes": b"rot", "fmt": "png"},  # skipped
    ]
    df = (luma_histogram(rd.from_pandas(pd.DataFrame(rows)))
          .to_pandas().sort_values("bin").reset_index(drop=True))
    assert df.to_dict("list") == {"bin": [10, 50, 200],
                                  "n_px": [512, 256, 256]}


def test_tile_sums_ragged_and_capped():
    # 10x13 image, 4x4 grid: ragged edges must partition exactly
    arr = (np.arange(10 * 13, dtype=np.uint8).reshape(10, 13)
           [..., None].repeat(3, axis=2))
    n, s = tile_sums_of(arr, 4, 4)
    assert n.shape == (4, 4)
    assert int(n.sum()) == 130
    from raqc_ray.ops.exposure import luma_cents
    assert int(s.sum()) == int(luma_cents(arr).sum())
    # tiny image: grid caps at the dims, tiles stay non-empty
    n2, s2 = tile_sums_of(np.full((2, 5, 3), 9, np.uint8), 4, 4)
    assert n2.shape == (2, 4) and (n2 > 0).all()
    assert int(s2.sum()) == 10 * 900


def test_tile_changes_planted_halves():
    a = rd.from_pandas(pd.DataFrame([
        {"image_id": "x", "bytes": encode_image(_two_tone(10, 100),
                                                "ppm"), "fmt": "ppm"},
        {"image_id": "y", "bytes": encode_image(_two_tone(20, 30),
                                                "png"), "fmt": "png"},
    ]))
    b = rd.from_pandas(pd.DataFrame([
        {"image_id": "x", "bytes": encode_image(_two_tone(10, 130),
                                                "ppm"), "fmt": "ppm"},
        {"image_id": "y", "bytes": encode_image(_two_tone(20, 33),
                                                "png"), "fmt": "png"},
    ]))
    out = (tile_changes(tile_means(a), tile_means(b), thr_c=500,
                        num_partitions=4)
           .to_pandas().set_index("image_id").sort_index())
    # x: right 8 tiles moved by 3000 cents; y: by 300 (< thr)
    assert int(out.loc["x", "n_tiles"]) == 16
    assert int(out.loc["x", "n_changed"]) == 8
    assert int(out.loc["x", "max_dc"]) == 3000
    assert int(out.loc["y", "n_changed"]) == 0
    assert int(out.loc["y", "max_dc"]) == 300


def test_lumahist_layout_invariance():
    # the corpus histogram must not depend on block layout
    rng = np.random.default_rng(11)
    rows = []
    for i in range(48):
        g1, g2 = int(rng.integers(0, 256)), int(rng.integers(0, 256))
        rows.append({"image_id": str(i),
                     "bytes": encode_image(_two_tone(g1, g2), "ppm"),
                     "fmt": "ppm"})
    df = pd.DataFrame(rows)
    a = (luma_histogram(rd.from_pandas(df)).to_pandas()
         .sort_values("bin").reset_index(drop=True))
    b = (luma_histogram(rd.from_pandas(df).repartition(7))
         .to_pandas().sort_values("bin").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert int(a["n_px"].sum()) == 48 * 512


def test_tile_changes_layout_invariance():
    rng = np.random.default_rng(12)
    rows_a, rows_b = [], []
    for i in range(40):
        g1, g2 = int(rng.integers(0, 200)), int(rng.integers(0, 200))
        d = int(rng.integers(0, 60))
        rows_a.append({"image_id": str(i),
                       "bytes": encode_image(_two_tone(g1, g2), "ppm"),
                       "fmt": "ppm"})
        rows_b.append({"image_id": str(i),
                       "bytes": encode_image(
                           _two_tone(g1, min(g2 + d, 255)), "png"),
                       "fmt": "png"})
    da, db = pd.DataFrame(rows_a), pd.DataFrame(rows_b)

    def run(na, nb):
        return (tile_changes(
            tile_means(rd.from_pandas(da).repartition(na)),
            tile_means(rd.from_pandas(db).repartition(nb)),
            thr_c=500).to_pandas()
            .sort_values("image_id").reset_index(drop=True))

    pd.testing.assert_frame_equal(run(1, 1), run(9, 3))
