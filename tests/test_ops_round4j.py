"""Unit gates for the round-4j batch: rolling COUNT DISTINCT, Zipf
fit, BFS hop distances, exact grouped KS — each vs a brute-force
driver-side reference plus closed-form cases."""

import math

import numpy as np
import pandas as pd
import pytest


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


# -------------------------------------------- rolling count distinct


def _brute_rolling(df, window=7):
    days = sorted(df["d"].unique())
    out = {}
    for d in days:
        out[int(d)] = df[(df["d"] >= d - window + 1)
                         & (df["d"] <= d)]["u"].nunique()
    return out


def test_rolling_distinct_vs_brute(ray_session):
    from raqc_ray.ops.distinct import rolling_count_distinct

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"u": rng.integers(0, 25, 500),
                       "d": rng.integers(100, 140, 500)})
    want = _brute_rolling(df)
    out = (rolling_count_distinct(_ds(df, 4), "d", "u", window=7)
           .to_pandas())
    got = dict(zip(out["d"].astype(int), out["n_distinct"].astype(int)))
    assert got == want


def test_rolling_distinct_gaps_and_window1(ray_session):
    from raqc_ray.ops.distinct import rolling_count_distinct

    # gap: day 10 and day 100 never share a window; window=1 is a
    # plain per-day distinct
    df = pd.DataFrame({"u": [1, 2, 1, 3, 3],
                       "d": [10, 10, 100, 100, 100]})
    out = (rolling_count_distinct(_ds(df, 2), "d", "u", window=7)
           .to_pandas().set_index("d"))
    assert int(out.loc[10, "n_distinct"]) == 2
    assert int(out.loc[100, "n_distinct"]) == 2
    out1 = (rolling_count_distinct(_ds(df, 2), "d", "u", window=1)
            .to_pandas().set_index("d"))
    assert int(out1.loc[10, "n_distinct"]) == 2
    assert int(out1.loc[100, "n_distinct"]) == 2


def test_rolling_distinct_layout_invariant(ray_session):
    from raqc_ray.ops.distinct import rolling_count_distinct

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"u": rng.integers(0, 10, 200),
                       "d": rng.integers(0, 20, 200)})
    outs = [rolling_count_distinct(_ds(df, k), "d", "u", window=3)
            .to_pandas().sort_values("d").reset_index(drop=True)
            for k in (1, 6)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------------------- zipf


def test_zipf_vs_brute(ray_session):
    from raqc_ray.ops.corpus import zipf_fit

    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(40)]
    probs = np.array([1.0 / (i + 1) for i in range(40)])
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=30, p=probs))
             for _ in range(60)]
    docs = pd.DataFrame({"doc_id": range(60), "text": texts})
    out = zipf_fit(_ds(docs, 4), "text").to_pandas()
    # brute force: per-token ranks under (count desc, token asc)
    toks = [t for s in texts for t in s.split() if t]
    vc = pd.Series(toks).value_counts()
    tc = (pd.DataFrame({"tok": vc.index, "c": vc.values})
          .sort_values(["c", "tok"], ascending=[False, True])
          .reset_index(drop=True))
    x = np.log(tc["c"].to_numpy(float))
    y = np.log(np.arange(1, len(tc) + 1, dtype=float))
    slope = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    intercept = y.mean() - slope * x.mean()
    assert int(out["n_tokens"].iloc[0]) == len(tc)
    assert out["slope"].iloc[0] == pytest.approx(slope, abs=1e-5)
    assert out["intercept"].iloc[0] == pytest.approx(intercept, abs=1e-5)
    # a 1/rank corpus regresses ln(rank) on ln(count) near -1
    assert -2.0 < out["slope"].iloc[0] < -0.5


def test_zipf_layout_invariant(ray_session):
    from raqc_ray.ops.corpus import zipf_fit

    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": ["a a a b b c", "a b c d", "a a e", "b c",
                 "a f f", "g a b", "c c a", "h"],
    })
    outs = [zipf_fit(_ds(docs, k), "text").to_pandas() for k in (1, 5)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# -------------------------------------------------------------- bfs


def _brute_bfs(pairs, seeds, max_hops):
    adj = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    dist = {int(s): 0 for s in seeds if int(s) in adj}
    frontier = set(dist)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
    return dist


def test_bfs_vs_brute(ray_session):
    from raqc_ray.ops.graph import bfs_distances

    rng = np.random.default_rng(13)
    a = rng.integers(0, 50, 300)
    b = rng.integers(0, 50, 300)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    pairs = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
    seeds = [0, 3, 999]  # 999 not in the graph
    want = _brute_bfs(pairs, seeds, 3)
    sd = _ds(pd.DataFrame({"id": seeds}), 2)
    out = bfs_distances(_ds(pairs, 5), sd, "a", "b", max_hops=3
                        ).to_pandas()
    got = dict(zip(out["id"].astype(int), out["dist"].astype(int)))
    assert got == want
    assert 999 not in got


def test_bfs_chain_exact_hops(ray_session):
    from raqc_ray.ops.graph import bfs_distances

    chain = pd.DataFrame({"a": [1, 2, 3, 4, 5], "b": [2, 3, 4, 5, 6]})
    sd = _ds(pd.DataFrame({"id": [1]}), 1)
    out = bfs_distances(_ds(chain, 3), sd, "a", "b", max_hops=2
                        ).to_pandas()
    got = dict(zip(out["id"].astype(int), out["dist"].astype(int)))
    assert got == {1: 0, 2: 1, 3: 2}  # 4,5,6 beyond max_hops


def test_bfs_no_seeds_in_graph(ray_session):
    from raqc_ray.ops.graph import bfs_distances

    pairs = pd.DataFrame({"a": [1], "b": [2]})
    sd = _ds(pd.DataFrame({"id": [77]}), 1)
    out = bfs_distances(_ds(pairs, 1), sd, "a", "b").to_pandas()
    assert len(out) == 0


# --------------------------------------------------------------- ks


def _brute_ks(df, scale=100):
    d = df.dropna()
    vi = np.floor(d["v"].to_numpy(float) * scale).astype(np.int64)
    ks = {}
    for k in sorted(d["k"].astype(str).unique()):
        mine = np.sort(vi[(d["k"].astype(str) == k).to_numpy()])
        rest = np.sort(vi[(d["k"].astype(str) != k).to_numpy()])
        grid = np.unique(vi)
        ct = np.searchsorted(mine, grid, side="right")
        cr = np.searchsorted(rest, grid, side="right")
        ks[k] = (len(mine), len(rest),
                 int(np.abs(ct * len(rest) - cr * len(mine)).max()))
    return ks


def test_ks_vs_brute(ray_session):
    from raqc_ray.ops.kstest import grouped_ks_vs_rest

    rng = np.random.default_rng(21)
    n = 600
    k = rng.choice(["x", "y", "z"], n)
    v = rng.normal(0, 1, n) + (k == "z") * 1.5  # z shifted
    df = pd.DataFrame({"k": k, "v": v})
    want = _brute_ks(df)
    out = grouped_ks_vs_rest(_ds(df, 4), "k", "v").to_pandas()
    got = {r["k"]: (int(r["n_key"]), int(r["n_rest"]), int(r["ks_num"]))
           for _, r in out.iterrows()}
    assert got == want
    # the shifted group must carry the largest normalized distance
    dn = {kk: got[kk][2] / (got[kk][0] * got[kk][1]) for kk in got}
    assert dn["z"] == max(dn.values())


def test_ks_identical_groups_zero(ray_session):
    from raqc_ray.ops.kstest import grouped_ks_vs_rest

    # two keys with IDENTICAL value multisets -> D = 0 exactly
    vals = [1.0, 2.0, 3.0, 4.0] * 5
    df = pd.DataFrame({"k": ["a"] * 20 + ["b"] * 20, "v": vals + vals})
    out = grouped_ks_vs_rest(_ds(df, 3), "k", "v").to_pandas()
    assert out["ks_num"].tolist() == [0, 0]


def test_ks_layout_invariant(ray_session):
    from raqc_ray.ops.kstest import grouped_ks_vs_rest

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"k": rng.choice(["p", "q"], 300),
                       "v": rng.uniform(-5, 5, 300)})
    outs = [grouped_ks_vs_rest(_ds(df, b), "k", "v").to_pandas()
            .sort_values("k").reset_index(drop=True) for b in (1, 7)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
