"""Round-4 session-h ops: duplicated-span census, tile census."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raqc_ray.ops.spandup import duplicated_span_census


def _brute_spandup(texts: dict[int, str], k: int) -> pd.DataFrame:
    grams: dict[int, list[tuple]] = {}
    for d, t in texts.items():
        toks = t.split()
        grams[d] = [tuple(toks[i:i + k])
                    for i in range(len(toks) - k + 1)]
    docs_of: dict[tuple, set] = {}
    for d, gs in grams.items():
        for g in gs:
            docs_of.setdefault(g, set()).add(d)
    rows = []
    for d, gs in grams.items():
        if not gs:
            continue
        dup = sum(1 for g in gs if len(docs_of[g]) >= 2)
        rows.append((d, len(gs), dup, 10_000 * dup // len(gs)))
    return (pd.DataFrame(rows, columns=["doc_id", "n_spans",
                                        "dup_spans", "dup_bp"])
            .sort_values("doc_id").reset_index(drop=True))


def test_spandup_planted(ray_session):
    quote = "the quick brown fox jumps over the lazy dog tonight"
    texts = {
        1: "alpha beta " + quote + " gamma delta epsilon zeta",
        2: "one two three " + quote + " four five six seven eight",
        3: "unrelated words only here nothing shared at all between any",
        4: quote,                      # exact sub-document of 1 and 2
        5: "short doc",                # < k tokens: no spans, no row
        6: "a a a a a a a a a a a a",  # self-repetition, single doc
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = (duplicated_span_census(rd.from_pandas(df).repartition(3),
                                  k=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _brute_spandup(texts, 8)
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp.astype("int64"))
    r = exp.set_index("doc_id")
    assert r.loc[4, "dup_bp"] == 10_000      # fully contained
    assert r.loc[3, "dup_spans"] == 0        # nothing shared
    assert r.loc[6, "dup_spans"] == 0        # repeats only within itself
    assert 5 not in r.index                  # sub-k doc emits no row
    assert 0 < r.loc[1, "dup_bp"] < 10_000


def test_spandup_layout_invariant(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for d in range(40):
        toks = [vocab[i] for i in rng.integers(0, 30, size=20)]
        texts[d] = " ".join(toks)
    # plant a shared sentence in a third of the docs
    shared = "zeta eta theta iota kappa lambda mu nu xi"
    for d in range(0, 40, 3):
        texts[d] = texts[d] + " " + shared
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})

    def run(parts):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        return (duplicated_span_census(ds, k=5).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    a = run(1)
    pd.testing.assert_frame_equal(a.astype("int64"),
                                  run(7).astype("int64"))
    pd.testing.assert_frame_equal(a.astype("int64"),
                                  _brute_spandup(texts, 5).astype("int64"))


def test_tile_census_closed_form():
    from raqc_ray.ops.tilecensus import tile_census_of

    # 16x24 grid of 8x8 tiles: values [[1, 2, 1], [2, 1, 2]] — value
    # 1 appears 3x, value 2 appears 3x, all flat
    arr = np.zeros((16, 24, 3), dtype=np.uint8)
    for r in range(2):
        for c in range(3):
            arr[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = (
                1 if (r + c) % 2 == 0 else 2)
    assert tile_census_of(arr) == (6, 2, 6, 3, 6)

    # make tile (0,0) a gradient: not flat, breaks its dup group
    g = np.arange(8, dtype=np.uint8)[None, :, None]
    arr2 = arr.copy()
    arr2[0:8, 0:8] = 1 + g
    assert tile_census_of(arr2) == (6, 3, 5, 3, 5)

    # partial margins excluded: 19x27 has the same complete tiles
    big = np.zeros((19, 27, 3), dtype=np.uint8)
    big[:16, :24] = arr
    big[16:, :] = 77
    big[:, 24:] = 88
    assert tile_census_of(big) == (6, 2, 6, 3, 6)

    # sub-tile image: no complete tile
    assert tile_census_of(np.zeros((5, 5, 3), dtype=np.uint8)) == (
        0, 0, 0, 0, 0)

    # all-unique gradient frame: no dups, nothing flat
    u = (np.arange(16 * 16 * 3, dtype=np.int64) % 251).astype(
        np.uint8).reshape(16, 16, 3)
    n, d, dup, mx, fl = tile_census_of(u)
    assert (n, d, dup, mx, fl) == (4, 4, 0, 1, 0)


def test_tile_census_stage_roundtrip(ray_session):
    from raqc_ray.codecs import encode_image
    from raqc_ray.ops.tilecensus import tile_census, tile_census_of

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
    arr[0:8, 0:8] = arr[8:16, 8:16]  # plant one copy-move pair
    rows = [{"image_id": "a", "bytes": encode_image(arr, "png"),
             "fmt": "png"},
            {"image_id": "b", "bytes": encode_image(arr, "ppm"),
             "fmt": "ppm"},
            {"image_id": "bad", "bytes": b"NOPE", "fmt": "png"}]
    out = (tile_census(rd.from_pandas(pd.DataFrame(rows)))
           .to_pandas().set_index("image_id"))
    exp = tile_census_of(arr)
    for img in ("a", "b"):  # lossless both ways -> identical census
        got = tuple(int(out.loc[img, c]) for c in
                    ("n_tiles", "distinct_tiles", "dup_tiles",
                     "max_mult", "flat_tiles"))
        assert got == exp == (4, 3, 2, 2, 0)
        assert bool(out.loc[img, "ok"])
    assert not bool(out.loc["bad", "ok"])
