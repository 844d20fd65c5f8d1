"""Round-4 session-j ops #3: CUSUM changepoint location,
multi-lag ACF numerators — closed-form planted fixtures,
layout invariance, hot-key skew."""

import numpy as np
import pandas as pd
import pytest


def _ds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


# ------------------------------------------------------ changepoint locate

def test_changepoint_planted_shift(ray_session):
    from raqc_ray.ops.cusum import grouped_changepoint

    # level shift exactly at position 50: mean 0 then mean 10
    v = np.concatenate([np.zeros(50), np.full(50, 10.0)])
    df = pd.DataFrame({
        "k": np.ones(100, dtype=np.int64),
        "t": np.arange(100),
        "id": np.arange(100),
        "val": v,
    })
    out = grouped_changepoint(_ds(df, 4), "k", "t", "id",
                              "val").to_pandas()
    assert len(out) == 1
    assert out["n"].iloc[0] == 100
    # max |n*S_t - t*S_n| at the shift point t = 50
    assert out["t_star"].iloc[0] == 50
    # d_max = |100*0 - 50*50000| = 2_500_000 (cents, scale 100)
    assert out["d_max"].iloc[0] == 2_500_000


def test_changepoint_constant_series(ray_session):
    from raqc_ray.ops.cusum import grouped_changepoint

    # constant series -> d = 0 everywhere -> smallest t wins
    df = pd.DataFrame({
        "k": [1] * 5, "t": range(5), "id": range(5),
        "val": [3.0] * 5,
    })
    out = grouped_changepoint(_ds(df, 2), "k", "t", "id",
                              "val").to_pandas()
    assert out["t_star"].iloc[0] == 1
    assert out["d_max"].iloc[0] == 0


def test_changepoint_layout_and_skew(ray_session):
    from raqc_ray.ops.cusum import grouped_changepoint

    rng = np.random.default_rng(31)
    n = 6000
    k = np.where(rng.random(n) < 0.6, 0, rng.integers(1, 40, n))
    df = pd.DataFrame({
        "k": k, "t": rng.integers(0, 10 ** 8, n),
        "id": np.arange(n), "val": rng.random(n) * 100,
    })
    outs = [(grouped_changepoint(_ds(df, p), "k", "t", "id", "val")
             .to_pandas().sort_values("k").reset_index(drop=True))
            for p in (1, 12)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # direct recompute for the hot key
    s = df[df["k"] == 0].sort_values(["t", "id"])
    vi = np.floor(s["val"].to_numpy() * 100 + 0.5).astype(np.int64)
    cum = np.cumsum(vi)
    t = np.arange(1, len(vi) + 1, dtype=np.int64)
    d = np.abs(len(vi) * cum - t * cum[-1])
    row = outs[0][outs[0]["k"] == 0].iloc[0]
    assert row["d_max"] == d.max()
    assert row["t_star"] == t[int(np.argmax(d))]


# ----------------------------------------------------------- multi-lag acf

def test_lag_products_multi_closed_form(ray_session):
    from raqc_ray.ops.lagprod import grouped_lag_products_multi

    # key 1: cents 100,200,300,400 (scale=100, vals 1..4)
    # lag1: 1*2+2*3+3*4 = 20 (x10^4 cents^2) ; lag2: 1*3+2*4 = 11;
    # lag3: 1*4 = 4
    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "t": [1, 2, 3, 4, 1],
        "id": [1, 2, 3, 4, 5],
        "val": [1.0, 2.0, 3.0, 4.0, 7.0],
    })
    out = (grouped_lag_products_multi(_ds(df, 3), "k", "t", "id",
                                      "val", lags=(1, 2, 3))
           .to_pandas().sort_values(["k", "lag"])
           .reset_index(drop=True))
    # key 2 has a single row: no pairs at any lag
    assert out["k"].tolist() == [1, 1, 1]
    assert out["lag"].tolist() == [1, 2, 3]
    assert out["n_pairs"].tolist() == [3, 2, 1]
    assert out["s_lag"].tolist() == [200000, 110000, 40000]


def test_lag_products_multi_vs_pandas(ray_session):
    from raqc_ray.ops.lagprod import grouped_lag_products_multi

    rng = np.random.default_rng(37)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 30, n),
        "t": rng.integers(0, 10 ** 8, n),
        "id": np.arange(n),
        "val": rng.random(n) * 50,
    })
    out = (grouped_lag_products_multi(_ds(df, 8), "k", "t", "id",
                                      "val", lags=(1, 3))
           .to_pandas().sort_values(["k", "lag"])
           .reset_index(drop=True))
    rows = []
    for k, g in df.groupby("k"):
        s = g.sort_values(["t", "id"])
        vi = np.floor(s["val"].to_numpy() * 100 + 0.5).astype(np.int64)
        for lag in (1, 3):
            if len(vi) > lag:
                rows.append((k, lag, len(vi) - lag,
                             int((vi[lag:] * vi[:-lag]).sum())))
    exp = pd.DataFrame(rows, columns=["k", "lag", "n_pairs", "s_lag"])
    exp = exp.sort_values(["k", "lag"]).reset_index(drop=True)
    assert out["n_pairs"].tolist() == exp["n_pairs"].tolist()
    assert out["s_lag"].tolist() == exp["s_lag"].tolist()


def test_lag_products_multi_layout_invariant(ray_session):
    from raqc_ray.ops.lagprod import grouped_lag_products_multi

    rng = np.random.default_rng(41)
    n = 4000
    k = np.where(rng.random(n) < 0.5, 3, rng.integers(0, 25, n))
    df = pd.DataFrame({
        "k": k, "t": rng.integers(0, 10 ** 7, n),
        "id": np.arange(n), "val": rng.random(n) * 20,
    })
    outs = [(grouped_lag_products_multi(_ds(df, p), "k", "t", "id",
                                        "val", lags=(1, 2))
             .to_pandas().sort_values(["k", "lag"])
             .reset_index(drop=True))
            for p in (1, 10)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
