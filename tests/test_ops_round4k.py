"""Unit gates for the round-4k batch: exact-integer grouped EWMA and
Welch's t vs the pooled rest — brute-force references, closed forms,
and block-layout invariance."""

import math

import numpy as np
import pandas as pd
import pytest


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


# ------------------------------------------------ integer EWMA chain


def _brute_ewma(df, num=1, den=5, scale=100):
    out = {}
    for k, g in df.groupby("k"):
        g = g.sort_values(["t", "i"], kind="mergesort")
        vi = np.floor(g["v"].to_numpy(dtype=np.float64) * scale
                      + 0.5).astype(np.int64)
        cur = int(vi[0])
        out[(int(k), int(g["i"].iloc[0]))] = cur
        for t in range(1, len(vi)):
            cur = cur + (num * (int(vi[t]) - cur)) // den
            out[(int(k), int(g["i"].iloc[t]))] = cur
    return out


def _ewma_frame(n_keys=12, n_rows=600, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, n_keys, n_rows),
        "t": rng.integers(0, 50, n_rows),
        "i": np.arange(n_rows, dtype=np.int64),
        # negative values exercise the floor-vs-trunc division branch
        "v": np.round(rng.uniform(-80, 80, n_rows), 2),
    })


def test_int_ewma_vs_brute(ray_session):
    from raqc_ray.ops.ewma import grouped_int_ewma

    df = _ewma_frame()
    want = _brute_ewma(df)
    out = grouped_int_ewma(_ds(df, 4), "k", "t", "i", "v").to_pandas()
    got = dict(zip(zip(out["k"].astype(int), out["i"].astype(int)),
                   out["ewma"].astype(int)))
    assert got == want


def test_int_ewma_layout_invariant(ray_session):
    from raqc_ray.ops.ewma import grouped_int_ewma

    df = _ewma_frame(seed=11)
    outs = []
    for blocks in (1, 3, 9):
        o = (grouped_int_ewma(_ds(df, blocks), "k", "t", "i", "v")
             .to_pandas().sort_values(["k", "i"])
             .reset_index(drop=True))
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


def test_int_ewma_hot_key(ray_session):
    # one key owns 60% of rows and spans every block — the boundary
    # re-dispatch path must still produce the exact chain
    from raqc_ray.ops.ewma import grouped_int_ewma

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "k": np.where(rng.uniform(size=n) < 0.6,
                      0, rng.integers(1, 8, n)),
        "t": rng.integers(0, 40, n),
        "i": np.arange(n, dtype=np.int64),
        "v": np.round(rng.uniform(0, 100, n), 2),
    })
    want = _brute_ewma(df)
    out = grouped_int_ewma(_ds(df, 6), "k", "t", "i", "v").to_pandas()
    got = dict(zip(zip(out["k"].astype(int), out["i"].astype(int)),
                   out["ewma"].astype(int)))
    assert got == want


def test_int_ewma_closed_form(ray_session):
    # alpha = 1/2 over a constant-then-step series: y halves the gap
    # each step (with floor): 0, 50, 75, 87, 93, 96, 98, 99, 99, ...
    from raqc_ray.ops.ewma import grouped_int_ewma

    vals = [0.0] + [1.0] * 8
    df = pd.DataFrame({"k": 1, "t": range(9),
                       "i": np.arange(9, dtype=np.int64), "v": vals})
    out = (grouped_int_ewma(_ds(df, 2), "k", "t", "i", "v",
                            num=1, den=2)
           .to_pandas().sort_values("i"))
    assert out["ewma"].tolist() == [0, 50, 75, 87, 93, 96, 98, 99, 99]


# --------------------------------------------------- Welch vs rest


def _brute_welch(df, scale=100):
    vi = np.floor(df["v"].to_numpy(dtype=np.float64) * scale
                  + 0.5).astype(np.int64)
    out = {}
    for k in sorted(df["k"].unique()):
        m = (df["k"] == k).to_numpy()
        a, b = vi[m], vi[~m]
        if len(a) < 2 or len(b) < 2:
            continue
        va = a.var(ddof=1) / len(a)
        vb = b.var(ddof=1) / len(b)
        out[k] = (a.mean() - b.mean()) / math.sqrt(va + vb)
    return out


def test_welch_vs_brute(ray_session):
    from raqc_ray.ops.stattests import grouped_welch_vs_rest

    rng = np.random.default_rng(19)
    df = pd.DataFrame({
        "k": rng.choice(list("abcd"), 400,
                        p=[0.4, 0.3, 0.2, 0.1]),
        "v": np.round(rng.uniform(0, 200, 400), 2),
    })
    # shift one group so the statistic is decisively nonzero
    df.loc[df["k"] == "a", "v"] += 50
    want = _brute_welch(df)
    out = grouped_welch_vs_rest(_ds(df, 3), "k", "v").to_pandas()
    got = dict(zip(out["k"], out["t_welch"]))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
    # the shifted group must test strongly positive
    assert got["a"] > 5


def test_welch_small_groups_dropped(ray_session):
    from raqc_ray.ops.stattests import grouped_welch_vs_rest

    df = pd.DataFrame({"k": ["a"] * 10 + ["b"],
                       "v": list(np.linspace(1, 10, 10)) + [5.0]})
    out = grouped_welch_vs_rest(_ds(df, 2), "k", "v").to_pandas()
    # "b" has n=1 (skipped); "a"'s rest has n=1 (skipped) -> empty
    assert len(out) == 0


def test_welch_layout_invariant(ray_session):
    from raqc_ray.ops.stattests import grouped_welch_vs_rest

    rng = np.random.default_rng(23)
    df = pd.DataFrame({"k": rng.choice(list("xyz"), 300),
                       "v": np.round(rng.uniform(-50, 50, 300), 2)})
    outs = []
    for blocks in (1, 4, 8):
        o = (grouped_welch_vs_rest(_ds(df, blocks), "k", "v")
             .to_pandas().sort_values("k").reset_index(drop=True))
        outs.append(o)
    for o in outs[1:]:
        # bit-identical, not approx: the epilogue is reproducible
        pd.testing.assert_frame_equal(outs[0], o)
