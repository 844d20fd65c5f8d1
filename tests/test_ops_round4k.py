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


# ------------------------------------------- degree assortativity


def _brute_assort(edges):
    import collections

    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs = [(deg[a], deg[b]) for a, b in edges]
    xs += [(y, x) for x, y in xs]
    m = len(xs)
    sx = sum(x for x, _ in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs)
    den = m * sxx - sx * sx
    return None if den == 0 else (m * sxy - sx * sx) / den


def _edge_ds(edges, blocks=3):
    df = pd.DataFrame(edges, columns=["a", "b"])
    return _ds(df, blocks)


def test_assortativity_star_is_minus_one(ray_session):
    from raqc_ray.ops.graph import degree_assortativity

    edges = [(0, i) for i in range(1, 6)]
    out = degree_assortativity(_edge_ds(edges), "a", "b").to_pandas()
    assert out["n_edges"].iloc[0] == 5
    assert out["assortativity"].iloc[0] == pytest.approx(-1.0)


def test_assortativity_regular_graph_null(ray_session):
    from raqc_ray.ops.graph import degree_assortativity

    # 4-cycle: every degree is 2 -> zero variance -> NULL coefficient
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    out = degree_assortativity(_edge_ds(edges), "a", "b").to_pandas()
    assert out["n_edges"].iloc[0] == 4
    assert pd.isna(out["assortativity"].iloc[0])


def test_assortativity_vs_brute_random(ray_session):
    from raqc_ray.ops.graph import degree_assortativity

    rng = np.random.default_rng(29)
    es = set()
    while len(es) < 300:
        a, b = rng.integers(0, 60, 2)
        if a != b:
            es.add((min(a, b), max(a, b)))
    edges = sorted(es)
    want = _brute_assort(edges)
    for blocks in (1, 5):
        out = (degree_assortativity(_edge_ds(edges, blocks), "a", "b")
               .to_pandas())
        assert out["n_edges"].iloc[0] == len(edges)
        # the op rounds to 9 decimals (oracle-hash discipline)
        assert out["assortativity"].iloc[0] == pytest.approx(
            round(want, 9), abs=1.5e-9)


# ------------------------------------------------------------ TWAP


def _brute_twap(df, scale=100):
    out = {}
    for k, g in df.groupby("k"):
        g = g.sort_values(["t", "i"], kind="mergesort")
        tu = g["t"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vi = np.floor(g["v"].to_numpy(dtype=np.float64) * scale
                      + 0.5).astype(np.int64)
        span = int(tu[-1] - tu[0])
        if span <= 0:
            continue
        num = int(sum(int(v) * int(d)
                      for v, d in zip(vi[:-1], np.diff(tu))))
        out[int(k)] = (span, num // span)
    return out


def _twap_frame(seed=31, n=400, n_keys=10):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2026-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "k": rng.integers(0, n_keys, n),
        "t": base + rng.integers(0, 3_600_000_000, n).astype(
            "timedelta64[us]"),
        "i": np.arange(n, dtype=np.int64),
        "v": np.round(rng.uniform(0, 300, n), 2),
    })
    # inject duplicate timestamps so the (ts, id) tiebreak is exercised
    df.loc[5, "t"] = df.loc[4, "t"]
    df.loc[5, "k"] = df.loc[4, "k"]
    return df


def test_twap_vs_brute(ray_session):
    from raqc_ray.ops.twap import grouped_twap

    df = _twap_frame()
    want = _brute_twap(df)
    out = grouped_twap(_ds(df, 4), "k", "t", "i", "v").to_pandas()
    got = {int(r.k): (int(r.span_us), int(r.twap))
           for r in out.itertuples()}
    assert got == want


def test_twap_layout_invariant_and_singletons(ray_session):
    from raqc_ray.ops.twap import grouped_twap

    df = _twap_frame(seed=37)
    # a singleton key and a zero-span pair must both emit nothing
    extra = pd.DataFrame({
        "k": [99, 98, 98],
        "t": [np.datetime64("2026-02-01T00:00:00", "us")] * 3,
        "i": [10_001, 10_002, 10_003],
        "v": [1.0, 2.0, 3.0],
    })
    df = pd.concat([df, extra], ignore_index=True)
    outs = []
    for blocks in (1, 3, 8):
        o = (grouped_twap(_ds(df, blocks), "k", "t", "i", "v")
             .to_pandas().sort_values("k").reset_index(drop=True))
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    assert 99 not in set(outs[0]["k"])
    assert 98 not in set(outs[0]["k"])


def test_twap_constant_value_is_value(ray_session):
    from raqc_ray.ops.twap import grouped_twap

    base = np.datetime64("2026-01-01", "us")
    df = pd.DataFrame({
        "k": [1] * 5,
        "t": base + np.array([0, 10, 99, 500, 501],
                             dtype="timedelta64[s]"),
        "i": np.arange(5, dtype=np.int64),
        "v": [7.25] * 5,
    })
    out = grouped_twap(_ds(df, 2), "k", "t", "i", "v").to_pandas()
    assert out["twap"].tolist() == [725]
    assert out["span_us"].tolist() == [501_000_000]


# --------------------------------------------------- Z-order layout


def test_zorder_interleave_bitexact():
    from raqc_ray.ops.zorder import interleave16

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rng = np.random.default_rng(41)
    xs = rng.integers(0, 65536, 300)
    ys = rng.integers(0, 65536, 300)
    got = interleave16(xs, ys)
    assert all(int(g) == ref(int(a), int(b))
               for g, a, b in zip(got, xs, ys))


def test_zorder_shard_stats_vs_brute(ray_session):
    from raqc_ray.ops.zorder import interleave16, zorder_shard_stats

    rng = np.random.default_rng(43)
    df = pd.DataFrame({"x": rng.integers(0, 5000, 2000),
                       "y": rng.integers(0, 90, 2000)})
    out = (zorder_shard_stats(_ds(df, 4), "x", "y", level=3)
           .to_pandas().sort_values("shard").reset_index(drop=True))
    z = interleave16(df["x"].to_numpy(), df["y"].to_numpy())
    df["shard"] = z >> np.int64(32 - 6)
    want = (df.groupby("shard")
            .agg(n_rows=("x", "size"), min_x=("x", "min"),
                 max_x=("x", "max"), min_y=("y", "min"),
                 max_y=("y", "max"))
            .reset_index().astype("int64")
            .sort_values("shard").reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype("int64"), want)


def test_zorder_envelopes_are_quadtree_cells(ray_session):
    # the pruning guarantee: at depth L every shard's x- and y-range
    # lives inside ONE aligned 2^(16-L) window in each dimension
    from raqc_ray.ops.zorder import zorder_shard_stats

    rng = np.random.default_rng(47)
    df = pd.DataFrame({"x": rng.integers(0, 65536, 3000),
                       "y": rng.integers(0, 65536, 3000)})
    level = 4
    out = zorder_shard_stats(_ds(df, 3), "x", "y",
                             level=level).to_pandas()
    cell = 16 - level
    assert (out["min_x"].to_numpy() >> cell
            == out["max_x"].to_numpy() >> cell).all()
    assert (out["min_y"].to_numpy() >> cell
            == out["max_y"].to_numpy() >> cell).all()
    assert out["n_rows"].sum() == len(df)


# ------------------------------------------- Kendall tau-b numerator


def _brute_kendall(x, v):
    s = 0
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            s += int(np.sign(x[j] - x[i])) * int(np.sign(v[j] - v[i]))
    return s


def test_kendall_vs_brute(ray_session):
    from raqc_ray.ops.kendall import grouped_kendall_numerator

    rng = np.random.default_rng(61)
    df = pd.DataFrame({
        "k": rng.integers(0, 6, 900),
        "x": rng.integers(0, 40, 900),           # heavy x ties
        "v": rng.normal(0, 3, 900).round(2),
    })
    out = (grouped_kendall_numerator(_ds(df, 4), "k", "x", "v",
                                     scale=100)
           .to_pandas().set_index("k"))
    for k, g in df.groupby("k"):
        vi = np.floor(g["v"].to_numpy() * 100 + 0.5).astype(np.int64)
        want = _brute_kendall(g["x"].to_numpy(np.int64), vi)
        assert int(out.loc[k, "s_num"]) == want
        assert int(out.loc[k, "n"]) == len(g)


def test_kendall_layout_invariant(ray_session):
    from raqc_ray.ops.kendall import grouped_kendall_numerator

    rng = np.random.default_rng(67)
    df = pd.DataFrame({
        "k": rng.integers(0, 3, 500),
        "x": rng.integers(0, 1000, 500),
        "v": rng.normal(0, 5, 500).round(2),
    })
    outs = []
    for blocks in (1, 7):
        o = (grouped_kendall_numerator(_ds(df, blocks), "k", "x", "v")
             .to_pandas().sort_values("k").reset_index(drop=True))
        outs.append(o.astype({"n": "int64", "s_num": "int64"}))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_kendall_monotone_extremes(ray_session):
    from raqc_ray.ops.kendall import grouped_kendall_numerator

    n = 80
    df = pd.DataFrame({
        "k": ["up"] * n + ["down"] * n,
        "x": list(range(n)) * 2,
        "v": [float(i) for i in range(n)]
             + [float(n - i) for i in range(n)],
    })
    out = (grouped_kendall_numerator(_ds(df, 3), "k", "x", "v")
           .to_pandas().set_index("k"))
    assert int(out.loc["up", "s_num"]) == n * (n - 1) // 2
    assert int(out.loc["down", "s_num"]) == -n * (n - 1) // 2


# --------------------------------------------- Benford digit census


def test_benford_vs_brute(ray_session):
    from raqc_ray.ops.benford import benford_digit_census

    rng = np.random.default_rng(71)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, 3000),
        "v": np.exp(rng.uniform(0, 12, 3000)),   # wide magnitude span
    })
    df.loc[:20, "v"] = 0.3                        # sub-1 rows excluded
    out = (benford_digit_census(_ds(df, 5), "k", "v")
           .to_pandas())
    got = {(int(r.k), int(r.digit)): int(r.n)
           for r in out.itertuples()}
    want: dict = {}
    for k, v in zip(df["k"], df["v"]):
        iv = int(np.floor(v))
        if iv < 1:
            continue
        want[(int(k), int(str(iv)[0]))] = \
            want.get((int(k), int(str(iv)[0])), 0) + 1
    assert got == want


# --------------------------------------------- rolling median (x2)


def test_rolling_median2_vs_brute(ray_session):
    from raqc_ray.ops.rollmed import grouped_rolling_median2

    rng = np.random.default_rng(73)
    df = pd.DataFrame({
        "k": rng.integers(0, 8, 700),
        "t": rng.integers(0, 60, 700),
        "i": np.arange(700, dtype=np.int64),
        "v": rng.normal(0, 4, 700).round(2),
    })
    out = (grouped_rolling_median2(_ds(df, 4), "k", "t", "i", "v",
                                   window=5)
           .to_pandas().set_index("i"))
    for k, g in df.groupby("k"):
        g = g.sort_values(["t", "i"], kind="mergesort")
        vi = np.floor(g["v"].to_numpy() * 100 + 0.5).astype(np.int64)
        for pos in range(len(g)):
            fr = sorted(vi[max(0, pos - 4): pos + 1])
            want = fr[(len(fr) - 1) // 2] + fr[len(fr) // 2]
            i = int(g["i"].iloc[pos])
            assert int(out.loc[i, "med2"]) == want


def test_rolling_median2_window1_is_value(ray_session):
    from raqc_ray.ops.rollmed import grouped_rolling_median2

    df = pd.DataFrame({"k": [1, 1, 2], "t": [1, 2, 1],
                       "i": [1, 2, 3], "v": [1.5, -2.0, 7.25]})
    out = (grouped_rolling_median2(_ds(df, 2), "k", "t", "i", "v",
                                   window=1)
           .to_pandas().sort_values("i"))
    assert out["med2"].tolist() == [300, -400, 1450]


# ------------------------------------------------- k-core peeling


def _brute_kcore(df, k):
    e = df[df["a"] != df["b"]].copy()
    while True:
        ids = np.concatenate([e["a"].to_numpy(), e["b"].to_numpy()])
        u, c = np.unique(ids, return_counts=True)
        low = set(u[c < k].tolist())
        if not low or not len(e):
            break
        e = e[~(e["a"].isin(low) | e["b"].isin(low))]
    return dict(zip(u.tolist(), c.tolist())) if len(e) else {}


def test_kcore_vs_brute(ray_session):
    from raqc_ray.ops.kcore import kcore

    rng = np.random.default_rng(83)
    raw = pd.DataFrame({"a": rng.integers(0, 60, 300),
                        "b": rng.integers(0, 60, 300)})
    # distinct undirected pairs, canonical a < b
    lo = np.minimum(raw["a"], raw["b"])
    hi = np.maximum(raw["a"], raw["b"])
    df = (pd.DataFrame({"a": lo, "b": hi})
          .drop_duplicates().reset_index(drop=True))
    for k in (2, 3, 5):
        out = kcore(_ds(df, 4), "a", "b", k=k).to_pandas()
        want = _brute_kcore(df, k)
        got = dict(zip(out["id"].astype(int), out["deg"].astype(int)))
        assert got == want, (k, got, want)


def test_kcore_planted_clique_survives(ray_session):
    from raqc_ray.ops.kcore import kcore

    # a 6-clique (nodes 100..105) rides on a long path (peels away)
    clique = [(a, b) for i, a in enumerate(range(100, 106))
              for b in list(range(100, 106))[i + 1:]]
    path = [(i, i + 1) for i in range(40)]
    df = pd.DataFrame(clique + path, columns=["a", "b"])
    out = kcore(_ds(df, 3), "a", "b", k=3).to_pandas()
    assert sorted(out["id"].tolist()) == list(range(100, 106))
    assert (out["deg"] == 5).all()


def test_kcore_empty_and_selfloops(ray_session):
    from raqc_ray.ops.kcore import kcore

    df = pd.DataFrame({"a": [1, 2, 3], "b": [1, 3, 4]})
    out = kcore(_ds(df, 2), "a", "b", k=2).to_pandas()
    assert len(out) == 0  # self-loop dropped; path chain peels away


# --------------------------------------------- interval union sweep


def _brute_union(st, en):
    ivs = sorted(zip(st.tolist(), en.tolist()))
    k = 0
    cov = 0
    cur_s = cur_e = None
    for a, b in ivs:
        if cur_e is None or a > cur_e:
            if cur_e is not None:
                cov += cur_e - cur_s
            k += 1
            cur_s, cur_e = a, b
        else:
            cur_e = max(cur_e, b)
    if cur_e is not None:
        cov += cur_e - cur_s
    return cov, k


def test_interval_union_vs_brute(ray_session):
    from raqc_ray.ops.intervals import grouped_interval_union

    rng = np.random.default_rng(89)
    st = rng.integers(0, 10_000, 800).astype(np.int64)
    df = pd.DataFrame({
        "k": rng.integers(0, 30, 800),
        "st": st,
        "en": st + rng.integers(0, 500, 800),
    })
    out = (grouped_interval_union(_ds(df, 5), "k", "st", "en")
           .to_pandas().set_index("k"))
    for k, g in df.groupby("k"):
        cov, isl = _brute_union(g["st"].to_numpy(), g["en"].to_numpy())
        assert int(out.loc[k, "covered"]) == cov
        assert int(out.loc[k, "n_islands"]) == isl


def test_interval_union_layout_invariant(ray_session):
    from raqc_ray.ops.intervals import grouped_interval_union

    rng = np.random.default_rng(97)
    st = rng.integers(0, 5_000, 400).astype(np.int64)
    df = pd.DataFrame({"k": rng.integers(0, 10, 400), "st": st,
                       "en": st + rng.integers(0, 300, 400)})
    frames = []
    for blocks in (1, 6):
        o = (grouped_interval_union(_ds(df, blocks), "k", "st", "en")
             .to_pandas().sort_values("k").reset_index(drop=True))
        frames.append(o.astype("int64"))
    pd.testing.assert_frame_equal(frames[0], frames[1])


# --------------------------------------------- lag-1 product sums


def test_lag_products_vs_brute(ray_session):
    from raqc_ray.ops.lagprod import grouped_lag_products

    rng = np.random.default_rng(101)
    df = pd.DataFrame({
        "k": rng.integers(0, 12, 600),
        "t": rng.integers(0, 50, 600),
        "i": np.arange(600, dtype=np.int64),
        "v": np.round(rng.uniform(-80, 80, 600), 2),
    })
    out = (grouped_lag_products(_ds(df, 4), "k", "t", "i", "v")
           .to_pandas().set_index("k"))
    for k, g in df.groupby("k"):
        g = g.sort_values(["t", "i"], kind="mergesort")
        vi = np.floor(g["v"].to_numpy() * 100 + 0.5).astype(np.int64)
        if len(vi) < 2:
            assert k not in out.index
            continue
        assert int(out.loc[k, "n_pairs"]) == len(vi) - 1
        assert int(out.loc[k, "s_lag"]) == int((vi[1:] * vi[:-1]).sum())


def test_lag_products_layout_invariant(ray_session):
    from raqc_ray.ops.lagprod import grouped_lag_products

    rng = np.random.default_rng(103)
    df = pd.DataFrame({"k": rng.integers(0, 5, 300),
                       "t": rng.integers(0, 40, 300),
                       "i": np.arange(300, dtype=np.int64),
                       "v": np.round(rng.uniform(0, 50, 300), 2)})
    frames = []
    for blocks in (1, 7):
        o = (grouped_lag_products(_ds(df, blocks), "k", "t", "i", "v")
             .to_pandas().sort_values("k").reset_index(drop=True))
        frames.append(o.astype("int64"))
    pd.testing.assert_frame_equal(frames[0], frames[1])


# ------------------------------------------ selection quantile


def test_qselect_vs_numpy(ray_session):
    from raqc_ray.ops.qselect import grouped_quantile_select

    rng = np.random.default_rng(107)
    df = pd.DataFrame({
        "k": rng.integers(0, 7, 900),
        "v": np.round(rng.normal(0, 400, 900), 2),  # wide domain
    })
    for q in (0.1, 0.5, 0.9, 1.0):
        out = (grouped_quantile_select(_ds(df, 4), "k", "v", q=q)
               .set_index("k"))
        for k, g in df.groupby("k"):
            vi = np.sort(np.floor(g["v"].to_numpy() * 100
                                  + 0.5).astype(np.int64))
            want = vi[max(1, int(np.ceil(q * len(vi)))) - 1]
            assert int(out.loc[k, "qv"]) == want, (q, k)
            assert int(out.loc[k, "n"]) == len(g)


def test_qselect_constant_group(ray_session):
    from raqc_ray.ops.qselect import grouped_quantile_select

    df = pd.DataFrame({"k": ["a"] * 5 + ["b"],
                       "v": [7.25] * 5 + [1.0]})
    out = (grouped_quantile_select(_ds(df, 2), "k", "v", q=0.5)
           .set_index("k"))
    assert int(out.loc["a", "qv"]) == 725
    assert int(out.loc["b", "qv"]) == 100


# ------------------------------------------ zlib compressibility


def test_compression_signal_entropy_ordering(ray_session):
    from raqc_ray.ops.compressibility import compression_signal

    rng = np.random.default_rng(109)
    rand_text = "".join(rng.choice(list("abcdefghij0123456789 "), 4000))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["spam ham " * 500, rand_text, ""],
    })
    out = (compression_signal(_ds(df, 2), "doc_id", "text")
           .to_pandas().set_index("doc_id"))
    assert 3 not in out.index            # empty doc excluded
    assert out.loc[1, "ratio_bp"] < 500  # repeated text: tiny
    assert out.loc[2, "ratio_bp"] > 3000  # high-entropy: large
    import zlib

    for d, t in ((1, "spam ham " * 500), (2, rand_text)):
        raw = t.encode()
        assert int(out.loc[d, "n_bytes"]) == len(raw)
        assert int(out.loc[d, "n_comp"]) == len(zlib.compress(raw, 6))
        assert int(out.loc[d, "ratio_bp"]) == \
            len(zlib.compress(raw, 6)) * 10000 // len(raw)


def test_compression_signal_layout_invariant(ray_session):
    from raqc_ray.ops.compressibility import compression_signal

    rng = np.random.default_rng(113)
    texts = ["".join(rng.choice(list("abcde "), rng.integers(5, 300)))
             for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60), "text": texts})
    frames = []
    for blocks in (1, 5):
        frames.append(compression_signal(_ds(df, blocks))
                      .to_pandas().sort_values("doc_id")
                      .reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])


# ------------------------------------------ per-node triangles


def _brute_tri_per_node(edges):
    import itertools

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cnt = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                cnt[v] = cnt.get(v, 0) + 1
    return cnt, {v: len(s) for v, s in adj.items()}


def test_triangle_counts_per_node_vs_brute(ray_session):
    from raqc_ray.ops.graph import triangle_counts_per_node

    rng = np.random.default_rng(127)
    es = set()
    while len(es) < 200:
        a, b = rng.integers(0, 40, 2)
        if a != b:
            es.add((min(a, b), max(a, b)))
    edges = sorted(es)
    df = pd.DataFrame(edges, columns=["a", "b"])
    out = (triangle_counts_per_node(_ds(df, 4), "a", "b")
           .to_pandas().set_index("id"))
    want, degs = _brute_tri_per_node(edges)
    assert sorted(out.index.tolist()) == sorted(want)
    for v, c in want.items():
        assert int(out.loc[v, "n_tri"]) == c
        assert int(out.loc[v, "deg"]) == degs[v]


def test_triangle_counts_per_node_clique(ray_session):
    from raqc_ray.ops.graph import triangle_counts_per_node

    # K5: every node sits in C(4,2)=6 triangles with degree 4
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = pd.DataFrame(edges, columns=["a", "b"])
    out = triangle_counts_per_node(_ds(df, 2), "a", "b").to_pandas()
    assert len(out) == 5
    assert (out["n_tri"] == 6).all()
    assert (out["deg"] == 4).all()


# ---------------------------------------- shingle containment


def test_containment_planted_inclusion(ray_session):
    from raqc_ray.ops.containment import shingle_containment_pairs

    rng = np.random.default_rng(131)
    vocab = [f"w{i}" for i in range(400)]
    long_doc = " ".join(rng.choice(vocab, 300))
    short_doc = " ".join(long_doc.split()[40:80])  # verbatim excerpt
    other = " ".join(rng.choice(vocab, 250))
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [long_doc, short_doc, other]})
    out = (shingle_containment_pairs(_ds(df, 2), threshold_bp=9000,
                                     max_df=10)
           .to_pandas())
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in got                    # excerpt fully contained
    row = out.set_index(["doc_a", "doc_b"]).loc[(1, 2)]
    assert int(row["containment_bp"]) >= 9000


def test_containment_vs_brute(ray_session):
    from raqc_ray.ops.containment import shingle_containment_pairs
    from raqc_ray.ops.dedup import _shingle_hashes, _token_hash

    rng = np.random.default_rng(137)
    base = [f"t{i}" for i in
            rng.integers(0, 60, 200)]      # shared base sequence
    texts = []
    for _ in range(25):                    # overlapping windows of it
        a = int(rng.integers(0, 150))
        b = a + int(rng.integers(5, 50))
        texts.append(" ".join(base[a:b]))
    df = pd.DataFrame({"doc_id": np.arange(25), "text": texts})
    max_df, thr = 8, 5000
    out = (shingle_containment_pairs(_ds(df, 3), threshold_bp=thr,
                                     max_df=max_df)
           .to_pandas())
    if "doc_a" not in out.columns:         # empty result schema
        out = pd.DataFrame(columns=["doc_a", "doc_b", "inter",
                                    "containment_bp"])
    got = {(int(a), int(b)): (int(i), int(c)) for a, b, i, c in
           zip(out["doc_a"], out["doc_b"], out["inter"],
               out["containment_bp"])}
    # brute force with the same hash shingles + df pruning
    shs = {}
    for d, t in zip(df["doc_id"], df["text"]):
        th = np.fromiter((_token_hash(x) for x in t.split()),
                         dtype=np.uint64, count=len(t.split()))
        shs[int(d)] = set(_shingle_hashes(th, 3).tolist())
    from collections import Counter

    dfc = Counter(s for v in shs.values() for s in v)
    keep = {s for s, c in dfc.items() if 2 <= c <= max_df}
    want = {}
    ids = sorted(shs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len((shs[a] & shs[b]) & keep)
            if inter == 0:
                continue
            bp = 10000 * inter // min(len(shs[a]), len(shs[b]))
            if bp >= thr:
                want[(a, b)] = (inter, bp)
    assert got == want


# ----------------------------------------------- max drawdown


def test_drawdown_vs_brute(ray_session):
    from raqc_ray.ops.drawdown import grouped_max_drawdown

    rng = np.random.default_rng(139)
    df = pd.DataFrame({
        "k": rng.integers(0, 10, 600),
        "t": rng.integers(0, 50, 600),
        "i": np.arange(600, dtype=np.int64),
        "v": np.round(rng.normal(0, 30, 600).cumsum() / 10, 2),
    })
    out = (grouped_max_drawdown(_ds(df, 4), "k", "t", "i", "v")
           .to_pandas().set_index("k"))
    for k, g in df.groupby("k"):
        g = g.sort_values(["t", "i"], kind="mergesort")
        vi = np.floor(g["v"].to_numpy() * 100 + 0.5).astype(np.int64)
        want = int((np.maximum.accumulate(vi) - vi).max())
        assert int(out.loc[k, "max_dd"]) == want
        assert int(out.loc[k, "n"]) == len(g)


def test_drawdown_monotone_is_zero(ray_session):
    from raqc_ray.ops.drawdown import grouped_max_drawdown

    df = pd.DataFrame({"k": [1] * 6, "t": range(6),
                       "i": np.arange(6, dtype=np.int64),
                       "v": [1.0, 2.0, 2.0, 3.5, 7.0, 7.25]})
    out = grouped_max_drawdown(_ds(df, 2), "k", "t", "i", "v") \
        .to_pandas()
    assert out["max_dd"].tolist() == [0]


# ------------------------------------------------- CDC merge


def test_apply_changes_basic(ray_session):
    from raqc_ray.ops.merge import apply_changes

    base = pd.DataFrame({"k": [1, 2, 3, 4],
                         "v": [10, 20, 30, 40]})
    delta = pd.DataFrame({"k": [2, 4, 9],
                          "v": [99, 0, 90],
                          "op": ["U", "D", "I"]})
    out = (apply_changes(_ds(base, 2), _ds(delta, 2), on="k")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2, 3, 9]
    assert out["v"].tolist() == [10, 99, 30, 90]


def test_apply_changes_duplicate_key_raises(ray_session):
    from raqc_ray.ops.merge import apply_changes

    base = pd.DataFrame({"k": [1], "v": [1]})
    delta = pd.DataFrame({"k": [2, 2], "v": [5, 6],
                          "op": ["I", "U"]})
    with pytest.raises(ValueError, match="duplicate keys"):
        apply_changes(_ds(base, 1), _ds(delta, 1), on="k")


# -------------------------------------------- charclass census


def test_charclass_vs_brute(ray_session):
    import re

    from raqc_ray.ops.charclass import charclass_census

    df = pd.DataFrame({
        "k": ["en", "en", "de", "zz"],
        "text": ["Hello World 42!", "a1 b2  c3", "Straße 99", None],
    })
    out = (charclass_census(_ds(df, 2), "k", "text")
           .to_pandas().set_index("k"))
    for k, g in df.groupby("k"):
        txt = "".join(g["text"].fillna(""))
        assert int(out.loc[k, "n_chars"]) == sum(
            len(t or "") for t in g["text"])
        assert int(out.loc[k, "n_digit"]) == len(re.findall(r"[0-9]",
                                                            txt))
        assert int(out.loc[k, "n_space"]) == txt.count(" ")
        assert int(out.loc[k, "n_alpha"]) == len(
            re.findall(r"[A-Za-z]", txt))
    assert int(out.loc["zz", "n_chars"]) == 0


# ---------------------------- hot-key skew gates (shared groupscan
# boundary re-dispatch must stay exact for every new scan-family op)


def _hot_frame(seed, n=600):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": np.where(rng.uniform(size=n) < 0.55,
                      0, rng.integers(1, 7, n)),
        "t": rng.integers(0, 50, n),
        "i": np.arange(n, dtype=np.int64),
        "v": np.round(rng.uniform(-40, 40, n), 2),
    })


def test_rolling_median2_hot_key(ray_session):
    from raqc_ray.ops.rollmed import grouped_rolling_median2

    df = _hot_frame(151)
    out = (grouped_rolling_median2(_ds(df, 6), "k", "t", "i", "v",
                                   window=5)
           .to_pandas().set_index("i"))
    g = df[df["k"] == 0].sort_values(["t", "i"], kind="mergesort")
    vi = np.floor(g["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    for pos in (0, 3, len(g) - 1):
        fr = sorted(vi[max(0, pos - 4): pos + 1])
        want = fr[(len(fr) - 1) // 2] + fr[len(fr) // 2]
        assert int(out.loc[int(g["i"].iloc[pos]), "med2"]) == want


def test_drawdown_hot_key(ray_session):
    from raqc_ray.ops.drawdown import grouped_max_drawdown

    df = _hot_frame(157)
    out = (grouped_max_drawdown(_ds(df, 6), "k", "t", "i", "v")
           .to_pandas().set_index("k"))
    g = df[df["k"] == 0].sort_values(["t", "i"], kind="mergesort")
    vi = np.floor(g["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    assert int(out.loc[0, "max_dd"]) == \
        int((np.maximum.accumulate(vi) - vi).max())


def test_lag_products_hot_key(ray_session):
    from raqc_ray.ops.lagprod import grouped_lag_products

    df = _hot_frame(163)
    out = (grouped_lag_products(_ds(df, 6), "k", "t", "i", "v")
           .to_pandas().set_index("k"))
    g = df[df["k"] == 0].sort_values(["t", "i"], kind="mergesort")
    vi = np.floor(g["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    assert int(out.loc[0, "s_lag"]) == int((vi[1:] * vi[:-1]).sum())


def test_interval_union_hot_key(ray_session):
    from raqc_ray.ops.intervals import grouped_interval_union

    df = _hot_frame(167)
    df["st"] = (df["t"] * 10).astype(np.int64)
    df["en"] = df["st"] + 25
    out = (grouped_interval_union(_ds(df, 6), "k", "st", "en")
           .to_pandas().set_index("k"))
    g = df[df["k"] == 0]
    cov, isl = _brute_union(g["st"].to_numpy(), g["en"].to_numpy())
    assert int(out.loc[0, "covered"]) == cov
    assert int(out.loc[0, "n_islands"]) == isl


# ------------------------------------------ temporal co-activity


def test_coactivity_vs_brute(ray_session):
    from raqc_ray.ops.temporal import temporal_coactivity_pairs

    rng = np.random.default_rng(173)
    df = pd.DataFrame({
        "g": rng.choice(list("ab"), 300),
        "t": rng.integers(0, 2000, 300).astype(np.int64),
        "u": rng.integers(0, 12, 300).astype(np.int64),
    })
    W = 50
    out = (temporal_coactivity_pairs(_ds(df, 4), "g", "t", "u",
                                     window_us=W)
           .to_pandas())
    got = {(int(a), int(b)): int(n) for a, b, n in
           zip(out["val_a"], out["val_b"], out["n"])}
    want: dict = {}
    for _, g in df.groupby("g"):
        t = g["t"].to_numpy()
        u = g["u"].to_numpy()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if abs(int(t[j]) - int(t[i])) <= W and u[i] != u[j]:
                    k = (min(int(u[i]), int(u[j])),
                         max(int(u[i]), int(u[j])))
                    want[k] = want.get(k, 0) + 1
    assert got == want


def test_coactivity_fanout_guard(ray_session):
    from raqc_ray.ops.temporal import temporal_coactivity_pairs

    df = pd.DataFrame({"g": ["x"] * 50,
                       "t": np.zeros(50, dtype=np.int64),
                       "u": np.arange(50, dtype=np.int64)})
    with pytest.raises((ValueError, Exception)):
        temporal_coactivity_pairs(_ds(df, 2), "g", "t", "u",
                                  window_us=10, max_fanout=5) \
            .to_pandas()


# --------------------------------------------- period retention


def test_retention_vs_brute(ray_session):
    from raqc_ray.ops.retention import period_retention

    rng = np.random.default_rng(179)
    df = pd.DataFrame({
        "wk": rng.integers(0, 6, 800).astype(np.int64),
        "u": rng.integers(0, 40, 800).astype(np.int64),
    })
    out = (period_retention(_ds(df, 4), "wk", "u")
           .to_pandas().set_index("period"))
    sets = {w: set(g["u"]) for w, g in df.groupby("wk")}
    for w in sorted(sets):
        if w + 1 not in sets:
            assert w not in out.index
            continue
        r = out.loc[w]
        assert int(r["n_prev"]) == len(sets[w])
        assert int(r["n_cur"]) == len(sets[w + 1])
        assert int(r["n_common"]) == len(sets[w] & sets[w + 1])


def test_retention_zero_overlap(ray_session):
    from raqc_ray.ops.retention import period_retention

    df = pd.DataFrame({"wk": [0, 0, 1, 1],
                       "u": [1, 2, 3, 4]})
    out = period_retention(_ds(df, 2), "wk", "u").to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_common"] == 0
    assert out.iloc[0]["n_prev"] == 2 and out.iloc[0]["n_cur"] == 2
