"""Round-4 session-i ops: connected-component blob census."""
from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raqc_ray.codecs import encode_image
from raqc_ray.ops.blobs import blob_census, blob_stats_of


def _brute_blobs(mask: np.ndarray) -> tuple[int, int, int]:
    """(fg_px, n_blobs, max_blob_px) via per-pixel BFS (4-conn)."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    sizes = []
    for i in range(h):
        for j in range(w):
            if mask[i, j] and not seen[i, j]:
                q = deque([(i, j)])
                seen[i, j] = True
                c = 0
                while q:
                    a, b = q.popleft()
                    c += 1
                    for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        x, y = a + da, b + db
                        if (0 <= x < h and 0 <= y < w and mask[x, y]
                                and not seen[x, y]):
                            seen[x, y] = True
                            q.append((x, y))
                sizes.append(c)
    return int(mask.sum()), len(sizes), max(sizes) if sizes else 0


def _img_of(mask: np.ndarray) -> np.ndarray:
    """White-on-black uint8 RGB render of a boolean mask."""
    return np.where(mask[..., None], 255, 0).astype(np.uint8).repeat(
        3, axis=2).reshape(*mask.shape, 3)


def _from_str(s: str) -> np.ndarray:
    rows = s.strip().split("\n")
    return np.array([[c == "#" for c in r] for r in rows])


SPIRAL = _from_str("""
#######
......#
#####.#
#...#.#
#.#.#.#
#.###.#
#.....#
#######
""")

COMB = _from_str("""
#.#.#.#.#
#.#.#.#.#
#########
""")

DIAG = _from_str("""
#.#.
.#.#
#.#.
""")

U_SHAPE = _from_str("""
##...##
##...##
##...##
#######
#######
""")


@pytest.mark.parametrize("mask", [SPIRAL, COMB, DIAG, U_SHAPE],
                         ids=["spiral", "comb", "diag", "u"])
def test_blob_adversarial_shapes(mask):
    got = blob_stats_of(_img_of(mask))
    assert got[:3] == _brute_blobs(mask)


def test_blob_diag_not_merged():
    # corner-touching pixels are SEPARATE components under 4-conn
    assert blob_stats_of(_img_of(DIAG))[1] == 6


def test_blob_random_brute_equivalence():
    rng = np.random.default_rng(7)
    for _ in range(120):
        h, w = rng.integers(1, 24, 2)
        mask = rng.random((h, w)) < rng.uniform(0.1, 0.9)
        got = blob_stats_of(_img_of(mask))
        assert got[:3] == _brute_blobs(mask)


def test_blob_empty_and_full():
    assert blob_stats_of(np.zeros((5, 5, 3), np.uint8)) == (0, 0, 0, 0)
    full = np.full((4, 6, 3), 255, np.uint8)
    assert blob_stats_of(full) == (24, 1, 24, 4)


def test_blob_n_runs():
    # comb: 2 rows x 5 teeth + 1 solid row = 11 horizontal runs
    assert blob_stats_of(_img_of(COMB))[3] == 11


def test_blob_threshold_is_exact_integer():
    # R+G+B = 381 is NOT foreground, 382 is (predicate is sum > 381)
    a = np.full((1, 2, 3), 127, np.uint8)       # sum 381
    b = a.copy()
    b[0, 1, 0] = 128                            # sum 382
    assert blob_stats_of(a) == (0, 0, 0, 0)
    assert blob_stats_of(b) == (1, 1, 1, 1)


def test_blob_stage_decode_and_degradation(ray_session):
    masks = [SPIRAL, COMB, DIAG, U_SHAPE]
    rows = []
    for i, m in enumerate(masks):
        fmt = "ppm" if i % 2 == 0 else "png"
        rows.append({"image_id": str(i),
                     "bytes": encode_image(_img_of(m), fmt),
                     "fmt": fmt})
    rows.append({"image_id": "bad", "bytes": b"not an image",
                 "fmt": "png"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    out = (blob_census(ds, batch_size=2).to_pandas()
           .set_index("image_id"))
    for i, m in enumerate(masks):
        fg, nb, mx = _brute_blobs(m)
        r = out.loc[str(i)]
        assert bool(r["ok"])
        assert (int(r["fg_px"]), int(r["n_blobs"]),
                int(r["max_blob_px"])) == (fg, nb, mx)
    bad = out.loc["bad"]
    assert not bool(bad["ok"]) and bad["error"]
