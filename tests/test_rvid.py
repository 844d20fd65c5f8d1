"""Gates for the RVID frame container + selective sampler: header
seek correctness, signature equality with direct decode, the
SELECTIVE-decode guarantee (a corrupted unsampled frame cannot
affect the output), per-frame error degradation, layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

from raqc_ray.codecs import dhash64, encode_image, synth_image
from raqc_ray.jpeg import encode_jpeg
from raqc_ray.ops.multimodal import (encode_rvid, rvid_index,
                                     sample_rvid_frames,
                                     sniff_image_format)


def _frame(seed, fmt="ppm", w=32, h=24):
    arr = synth_image(np.random.default_rng(seed), w, h)
    if fmt == "jpeg":
        return encode_jpeg(arr, quality=92), arr
    return encode_image(arr, fmt), arr


def _vid(seeds, fmt="ppm"):
    frames, arrs = zip(*[_frame(s, fmt) for s in seeds])
    return encode_rvid(list(frames)), list(frames), list(arrs)


def _table(rows):
    return pa.table({
        "item_id": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
    })


def test_rvid_index_roundtrip():
    data, frames, _ = _vid(range(5))
    idx = rvid_index(data)
    assert len(idx) == 5
    for (off, ln), f in zip(idx, frames):
        assert data[off:off + ln] == f


def test_rvid_sniff_formats():
    for fmt in ("ppm", "png"):
        b, _ = _frame(1, fmt)
        assert sniff_image_format(b) == fmt
    b, _ = _frame(1, "jpeg")
    assert sniff_image_format(b) == "jpeg"


def test_rvid_sampler_signatures_match_direct(ray_session):
    import ray.data as rd

    data, frames, arrs = _vid(range(6), fmt="ppm")
    ds = rd.from_arrow(_table([("v1", data)]))
    out = (sample_rvid_frames(ds, k=3).to_pandas()
           .sort_values("frame_idx").reset_index(drop=True))
    assert out["ok"].all()
    assert (out["n_frames"] == 6).all()
    sel = out["frame_idx"].tolist()
    assert sel == sorted(set((np.arange(3) * 6) // 3))
    for _, r in out.iterrows():
        arr = arrs[int(r["frame_idx"])]
        assert int(r["dhash"]) == dhash64(arr)
        y = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        assert int(r["mean_c"]) == int(np.floor(y.mean() * 100 + 0.5))


def test_rvid_selective_decode_skips_unsampled(ray_session):
    import ray.data as rd

    data, frames, arrs = _vid(range(4), fmt="ppm")
    # k=2 over 4 frames samples indices {0, 2}; corrupt frame 1 and 3
    # IN PLACE (same length, garbage bytes) — a sampler that decodes
    # every frame would fail; a selective one never touches them
    bad = [frames[0], b"\x00" * len(frames[1]),
           frames[2], b"\xFF" * len(frames[3])]
    corrupted = encode_rvid(bad)
    ds = rd.from_arrow(_table([("v1", corrupted)]))
    out = (sample_rvid_frames(ds, k=2).to_pandas()
           .sort_values("frame_idx").reset_index(drop=True))
    assert out["frame_idx"].tolist() == [0, 2]
    assert out["ok"].all()
    assert int(out.loc[0, "dhash"]) == dhash64(arrs[0])
    assert int(out.loc[1, "dhash"]) == dhash64(arrs[2])


def test_rvid_error_degradation(ray_session):
    import ray.data as rd

    data, frames, _ = _vid(range(3), fmt="ppm")
    bad_frame = encode_rvid([b"garbage-not-an-image",
                             frames[1], frames[2]])
    rows = [("good", data), ("badmagic", b"NOPE" + data[4:]),
            ("badframe", bad_frame)]
    out = sample_rvid_frames(
        rd.from_arrow(_table(rows)), k=3).to_pandas()
    g = out[out["item_id"] == "good"]
    assert g["ok"].all() and len(g) == 3
    bm = out[out["item_id"] == "badmagic"]
    assert len(bm) == 1 and not bm["ok"].iloc[0]
    assert bm["error"].iloc[0].startswith("DecodeError")
    bf = out[out["item_id"] == "badframe"]
    assert len(bf) == 3
    assert (~bf[bf["frame_idx"] == 0]["ok"]).all()
    assert bf[bf["frame_idx"] > 0]["ok"].all()


def test_rvid_layout_invariant(ray_session):
    import ray.data as rd

    rows = []
    for v in range(5):
        data, _, _ = _vid(range(v * 7, v * 7 + 4), fmt="ppm")
        rows.append((f"v{v}", data))
    frames = []
    for blocks in (1, 4):
        ds = rd.from_arrow(_table(rows)).repartition(blocks)
        frames.append(sample_rvid_frames(ds, k=2).to_pandas()
                      .sort_values(["item_id", "frame_idx"])
                      .reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])
