"""Gates for the dHash pixel-hash stage: dHash property tests plus
the bytes → hash → candidate-pairs corpus path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raqc_ray.codecs import (decode_image, dhash64, encode_image,
                             hamming64, phash64, synth_image)


def _img(seed, w=64, h=48):
    rng = np.random.default_rng(seed)
    return synth_image(rng, w, h)


def test_dhash_deterministic_and_distinct():
    a, b = _img(1), _img(2)
    assert dhash64(a) == dhash64(a)
    # two independent random images differ in many bits
    assert hamming64(dhash64(a), dhash64(b)) > 10


def test_dhash_uniform_brightness_invariant():
    rng = np.random.default_rng(3)
    arr = rng.integers(50, 200, (40, 60, 3)).astype(np.uint8)
    shifted = (arr.astype(np.int16) + 20).astype(np.uint8)  # no clip
    assert dhash64(arr) == dhash64(shifted)
    # ...which phash64's global median threshold does NOT guarantee
    # for non-uniform shifts; dhash is the gradient complement
    assert isinstance(phash64(arr), int)


def test_dhash_small_perturbation_small_distance():
    a = _img(5)
    b = a.copy()
    b[10:12, 10:12] = 0  # tiny local edit
    assert hamming64(dhash64(a), dhash64(b)) <= 4


def test_dhash_tiny_image_path():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, (5, 6, 3)).astype(np.uint8)
    assert isinstance(dhash64(arr), int)  # grid loop path (h<8 or w<9)


def _table(rows):
    return pa.table({
        "image_id": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
        "fmt": pa.array([r[2] for r in rows], pa.string()),
    })


def test_dhash_stage_reencode_invariant(ray_session):
    import ray.data as rd

    from raqc_ray.ops.imagehash import compute_dhash

    arr = _img(11)
    t = _table([("a", encode_image(arr, "ppm"), "ppm"),
                ("b", encode_image(arr, "png"), "png")])
    out = (compute_dhash(rd.from_arrow(t), concurrency=1)
           .to_pandas().set_index("image_id"))
    assert bool(out.loc["a", "ok"]) and bool(out.loc["b", "ok"])
    assert out.loc["a", "dhash"] == out.loc["b", "dhash"]


def test_dhash_stage_bad_bytes_degrade(ray_session):
    import ray.data as rd

    from raqc_ray.ops.imagehash import compute_dhash

    t = _table([("good", encode_image(_img(13), "ppm"), "ppm"),
                ("bad", b"not an image", "png")])
    out = (compute_dhash(rd.from_arrow(t), concurrency=1)
           .to_pandas().set_index("image_id"))
    assert bool(out.loc["good", "ok"])
    assert not bool(out.loc["bad", "ok"])
    assert out.loc["bad", "error"]


def test_dhash_corpus_neardup_pipeline(ray_session):
    """bytes → dhash → hamming_pairs recovers exactly the planted
    near-dup pair out of 40 distinct images."""
    import ray.data as rd

    from raqc_ray.ops.concomp import hamming_pairs
    from raqc_ray.ops.imagehash import compute_dhash

    rows = []
    for i in range(40):
        rows.append((str(i), encode_image(_img(100 + i), "ppm"), "ppm"))
    near = _img(100).copy()
    near[5:7, 5:7] = 0                      # near-dup of image 0
    rows.append(("40", encode_image(near, "ppm"), "ppm"))

    hashes = compute_dhash(rd.from_arrow(_table(rows)).repartition(4),
                           concurrency=1)
    keyed = hashes.map_batches(
        lambda t: pa.table({
            "nid": pa.compute.cast(t["image_id"], pa.int64()),
            "h": t["dhash"]}),
        batch_format="pyarrow")
    pairs = (hamming_pairs(keyed, "nid", "h", max_hamming=4)
             .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert pairs[["a", "b"]].values.tolist() == [[0, 40]]
