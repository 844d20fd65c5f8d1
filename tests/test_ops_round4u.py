"""Gates for the cross-epoch PSNR census (ops/psnr): exact SSE,
float-free 40 dB gate, degradation, join alignment."""

import numpy as np
import pandas as pd
import ray.data as rd

from raqc_ray.codecs import encode_image
from raqc_ray.ops.psnr import pair_psnr_census, sse_of


def test_sse_of_closed_form():
    a = np.zeros((2, 3, 3), dtype=np.uint8)
    b = a.copy()
    b[0, 0, :] = 5  # three samples differ by 5
    n, sse = sse_of(a, b)
    assert (n, sse) == (18, 3 * 25)
    assert sse_of(a, a) == (18, 0)


def test_pair_psnr_census_gate_and_degradation(ray_session):
    def rows(vals, fmt="png", extra=None):
        out = []
        for iid, v in vals:
            arr = np.full((4, 4, 3), v, dtype=np.uint8)
            out.append({"image_id": iid,
                        "bytes": encode_image(arr, fmt), "fmt": fmt})
        if extra:
            out.append(extra)
        return pd.DataFrame(out)

    # id x: identical (pass40, psnr capped); id y: differs by 10
    # (mse=100 > 6.5025 -> fail); id z: differs by 2 (mse=4 -> pass);
    # id w: undecodable on side b; id only_a: no partner (dropped)
    a = rows([("x", 100), ("y", 50), ("z", 30), ("w", 10),
              ("only_a", 5)])
    b_extra = {"image_id": "w", "bytes": b"JUNK", "fmt": "png"}
    b = rows([("x", 100), ("y", 60), ("z", 32)], extra=b_extra)

    out = (pair_psnr_census(rd.from_pandas(a), rd.from_pandas(b))
           .to_pandas().set_index("image_id").sort_index())
    assert len(out) == 4  # only_a dropped by the inner join
    assert out.loc["x", "sse"] == 0 and bool(out.loc["x", "pass40"])
    assert out.loc["x", "psnr_db"] == 99.0
    n = 48
    assert out.loc["y", "sse"] == n * 100
    assert not bool(out.loc["y", "pass40"])
    assert out.loc["z", "sse"] == n * 4
    assert bool(out.loc["z", "pass40"])
    # exact gate matches the float PSNR on both sides of 40
    assert out.loc["z", "psnr_db"] > 40 > out.loc["y", "psnr_db"]
    assert not bool(out.loc["w", "ok"])


def test_grouped_covariance_matches_global(ray_session):
    from raqc_ray.ops.embcov import (covariance_matrix,
                                     grouped_covariance_matrix)

    rng = np.random.default_rng(13)
    mat = rng.normal(size=(50, 4)) * 2.0
    labels = rng.integers(0, 3, size=50)
    df = pd.DataFrame({
        "label": labels,
        "embedding": [list(map(float, r)) for r in mat]})

    out = (grouped_covariance_matrix(
        rd.from_pandas(df).repartition(5), "label", "embedding",
        dim=4).to_pandas()
        .sort_values(["label", "i", "j"]).reset_index(drop=True))

    for lb in range(3):
        sub = df[df["label"] == lb][["embedding"]]
        exp = (covariance_matrix(rd.from_pandas(sub), "embedding",
                                 dim=4).to_pandas()
               .sort_values(["i", "j"]).reset_index(drop=True))
        got = (out[out["label"] == lb]
               .drop(columns=["label"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)


def test_channel_stats_closed_form(ray_session):
    from raqc_ray.ops.chanstats import channel_stats, channel_stats_of

    # planted 2x2: one gray pixel, odd/even LSB mix
    arr = np.zeros((1, 2, 3), dtype=np.uint8)
    arr[0, 0] = (3, 3, 3)     # gray, all LSB=1
    arr[0, 1] = (4, 5, 6)     # not gray, LSBs 0,1,0
    stats = channel_stats_of(arr)
    assert stats == (2,
                     7, 8, 9,                  # sums
                     25, 34, 45,               # squares
                     3 * 3 + 4 * 5, 9 + 24, 9 + 30,  # cross
                     1, 2, 1,                  # lsb
                     1)                        # n_gray

    rows = [{"image_id": "a",
             "bytes": __import__("raqc_ray.codecs",
                                 fromlist=["encode_image"]
                                 ).encode_image(arr, "png"),
             "fmt": "png"},
            {"image_id": "bad", "bytes": b"NOPE", "fmt": "png"}]
    out = (channel_stats(rd.from_pandas(pd.DataFrame(rows)))
           .to_pandas().set_index("image_id"))
    assert int(out.loc["a", "sum_gb"]) == 9 + 30
    assert int(out.loc["a", "n_gray"]) == 1
    assert not bool(out.loc["bad", "ok"])
