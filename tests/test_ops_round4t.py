"""Gates for the exact quantized covariance matrix (ops/embcov):
closed-form tiny matrix, numpy cross-check, block-layout invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raqc_ray.ops.embcov import covariance_matrix


def _ds(mat, n_blocks=1):
    df = pd.DataFrame({"embedding": [list(map(float, r)) for r in mat]})
    ds = rd.from_pandas(df)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_embcov_closed_form(ray_session):
    # rows (1,2), (3,4): scale=10 -> q = [[10,20],[30,40]]
    out = (covariance_matrix(_ds([[1, 2], [3, 4]]), "embedding",
                             dim=2, scale=10)
           .to_pandas().set_index(["i", "j"]).sort_index())
    assert out.loc[(1, 1), "sum_qq"] == 10 * 10 + 30 * 30  # 1000
    assert out.loc[(1, 2), "sum_qq"] == 10 * 20 + 30 * 40  # 1400
    assert out.loc[(2, 2), "sum_qq"] == 20 * 20 + 40 * 40  # 2000
    # cov_num = n*sum_qq - s_i*s_j; s = [40, 60], n = 2
    # (decimal string: exact beyond int64)
    assert int(out.loc[(1, 1), "cov_num"]) == 2 * 1000 - 40 * 40
    assert int(out.loc[(1, 2), "cov_num"]) == 2 * 1400 - 40 * 60
    assert int(out.loc[(2, 2), "cov_num"]) == 2 * 2000 - 60 * 60
    assert (out["n"] == 2).all()
    assert len(out) == 3  # upper triangle only


def test_embcov_exact_beyond_int64(ray_session):
    # 400 rows of value ~1000 at scale 1e4 -> n*sum_qq ~ 1.6e19 > 2^63
    vals = [1000.0 + k * 0.25 for k in range(400)]
    df = pd.DataFrame({"embedding": [[v] for v in vals]})
    out = (covariance_matrix(rd.from_pandas(df).repartition(3),
                             "embedding", dim=1)
           .to_pandas())
    q = [int(np.floor(v * 10_000)) for v in vals]
    n, sqq, s = len(q), sum(x * x for x in q), sum(q)
    assert n * sqq > 2**63  # the branch int64 cannot represent
    assert int(out["sum_qq"].iloc[0]) == sqq
    assert int(out["cov_num"].iloc[0]) == n * sqq - s * s


def test_embcov_matches_numpy_and_layout(ray_session):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(60, 8)) * 2.5
    q = np.floor(mat * 10_000).astype(np.int64)
    gram = q.T @ q
    s = q.sum(axis=0)
    n = len(mat)

    def run(blocks):
        return (covariance_matrix(_ds(mat, blocks), "embedding",
                                  dim=8).to_pandas()
                .sort_values(["i", "j"]).reset_index(drop=True))

    a = run(1)
    assert len(a) == 8 * 9 // 2
    for _, r in a.iterrows():
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        assert int(r["sum_qq"]) == int(gram[i, j])
        assert int(r["cov_num"]) == n * int(gram[i, j]) - int(s[i]) * int(s[j])
    pd.testing.assert_frame_equal(a, run(7))  # layout invariance


def test_normalized_dedup_collapses_variants(ray_session):
    from raqc_ray.ops.dedup import normalized_dedup

    rows = [
        (1, "Hello,  World!"),
        (2, "hello world"),          # same after normalization
        (3, "HELLO --- WORLD"),      # same
        (4, "hello worlds"),         # different
        (5, None),                   # -> ""
        (6, "?!"),                   # -> "" (same as 5)
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = (normalized_dedup(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 3
    assert out.loc[0, "doc_id"] == 1 and out.loc[0, "n"] == 3
    assert out.loc[1, "doc_id"] == 4 and out.loc[1, "n"] == 1
    assert out.loc[2, "doc_id"] == 5 and out.loc[2, "n"] == 2


def test_bigram_repetition_closed_form(ray_session):
    from raqc_ray.ops.repetition import bigram_repetition

    rows = [
        (1, "a b a b a b"),        # bigrams: ab,ba,ab,ba,ab -> top 3
        (2, "x y z"),              # xy,yz -> top 1
        (3, "w"),                  # no bigrams
        (4, ""),                   # empty
        (5, None),                 # null
        (6, "  pad  pad  "),       # edge whitespace; pad-pad once
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = (bigram_repetition(rd.from_pandas(df).repartition(3))
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1].tolist() == [6, 5, 3]
    assert out.loc[2].tolist() == [3, 2, 1]
    assert out.loc[3].tolist() == [1, 0, 0]
    assert out.loc[4].tolist() == [0, 0, 0]
    assert out.loc[5].tolist() == [0, 0, 0]
    assert out.loc[6].tolist() == [2, 1, 1]


def test_stripe_stats_closed_form():
    from raqc_ray.ops.stripes import stripe_stats_of

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    assert stripe_stats_of(arr) == (10, 12, 0, 0, 1)

    arr2 = arr.copy()
    arr2[2, :, :] = 77            # dead scanline
    arr2[3, :, :] = 78            # second, different value
    arr2[6:9] = arr2[5]           # stuck buffer: rows 5..8 identical
    h, w, ncr, ncc, run = stripe_stats_of(arr2)
    assert (ncr, ncc, run) == (2, 0, 4)

    flat = np.full((4, 6, 3), 9, dtype=np.uint8)
    assert stripe_stats_of(flat) == (4, 6, 4, 6, 4)

    col = arr.copy()
    col[:, 7, :] = 200            # dead column
    assert stripe_stats_of(col)[3] == 1


def test_stripe_stage_roundtrip(ray_session):
    from raqc_ray.codecs import encode_image
    from raqc_ray.ops.stripes import stripe_census

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    arr[1, :, :] = 50
    rows = [{"image_id": "a", "bytes": encode_image(arr, "png"),
             "fmt": "png"},
            {"image_id": "bad", "bytes": b"JUNK", "fmt": "png"}]
    out = (stripe_census(rd.from_pandas(pd.DataFrame(rows)))
           .to_pandas().set_index("image_id"))
    assert int(out.loc["a", "n_const_rows"]) == 1
    assert bool(out.loc["a", "ok"])
    assert not bool(out.loc["bad", "ok"])


def test_pca_top_recovers_planted_direction(ray_session):
    from raqc_ray.ops.embcov import pca_top

    rng = np.random.default_rng(21)
    d = 6
    direction = np.zeros(d)
    direction[2] = 1.0  # variance concentrated on axis 3
    mat = (rng.normal(size=(300, 1)) * 5.0 @ direction[None, :]
           + rng.normal(size=(300, d)) * 0.05)

    def run(blocks):
        df = pd.DataFrame(
            {"embedding": [list(map(float, r)) for r in mat]})
        ds = rd.from_pandas(df)
        if blocks > 1:
            ds = ds.repartition(blocks)
        return pca_top(ds, "embedding", dim=d, k=2)

    out = run(1)
    top = out[out["comp"] == 1].sort_values("pos")
    # the planted axis dominates the first component
    assert abs(top["loading"].to_numpy()[2]) > 0.99
    assert top["evr"].iloc[0] > 0.95
    # exact-integer input -> bit-identical across layouts
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), run(5).reset_index(drop=True))


def test_grouped_quantile_cont_num(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_quantile_cont_num

    rng = np.random.default_rng(3)
    rows = []
    for k in range(5):
        for v in rng.integers(0, 40, size=10 + k):
            rows.append((k, int(v)))
    rows.append((9, 7))  # single-row group: both quantiles = value
    df = pd.DataFrame(rows, columns=["k", "v"])

    out = (grouped_quantile_cont_num(
        rd.from_pandas(df).repartition(4), "k", "v")
        .to_pandas().set_index("k").sort_index())

    for k, g in df.groupby("k"):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        for pn, col in ((25, "p25_100_num"), (90, "p90_100_num")):
            q, r = divmod((n - 1) * pn, 100)
            hi = v[q + 1] if q + 1 < n else v[q]
            expected = int(v[q]) * 100 + (int(hi) - int(v[q])) * r
            assert int(out.loc[k, col]) == expected, (k, col)
            # cross-check vs numpy's linear interpolation
            assert abs(expected / 100
                       - float(np.percentile(v, pn))) < 1e-9
        assert int(out.loc[k, "n"]) == n
