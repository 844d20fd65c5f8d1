"""Round-4 second-batch operator gates: funnel conversion, blocked
edit-distance join, unpivot, weighted average, continuous quantiles,
cross-table reconciliation, embedding norm stats."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _brute_funnel(df, window):
    """Reference: per user, qualifying purchases = those with a view
    at-or-before within window."""
    out = {}
    for uid, g in df.groupby("u"):
        views = sorted(g[g.t_col == "A"]["ts"])
        convs = []
        for _, r in g[g.t_col == "B"].iterrows():
            if any(v <= r["ts"] and (r["ts"] - v) <= window for v in views):
                convs.append(r["ts"])
        if convs:
            out[uid] = (min(convs), len(convs))
    return out


def test_funnel_matches_bruteforce(ray_session):
    from raqc_ray.ops.funnel import funnel_conversions

    rng = np.random.default_rng(9)
    n = 3000
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame({
        "u": rng.integers(0, 150, n).astype(np.int64),
        "ts": base + rng.integers(0, 10**9, n).astype("timedelta64[us]"),
        "t_col": rng.choice(["A", "B", "C"], n),
    })
    window = np.timedelta64(3600, "s")
    want = _brute_funnel(df, window)
    got = (funnel_conversions(rd.from_pandas(df).repartition(9),
                              "u", "ts", "t_col", "A", "B", "1h")
           .to_pandas())
    got_map = {int(r["u"]): (np.datetime64(r["conv_ts"], "us"),
                             int(r["n_conversions"]))
               for _, r in got.iterrows()}
    assert got_map == {k: (np.datetime64(v[0], "us"), v[1])
                       for k, v in want.items()}


def test_funnel_simultaneous_view_purchase_qualifies(ray_session):
    from raqc_ray.ops.funnel import funnel_conversions

    t0 = np.datetime64("2024-05-01T00:00:00", "us")
    df = pd.DataFrame({
        "u": np.array([1, 1, 2], dtype=np.int64),
        "ts": np.array([t0, t0, t0]),
        "t_col": ["A", "B", "B"],  # user 1: simultaneous A+B; user 2: B only
    })
    got = (funnel_conversions(rd.from_pandas(df), "u", "ts", "t_col",
                              "A", "B", "1h").to_pandas())
    assert list(got["u"].astype(int)) == [1]
    assert int(got["n_conversions"].iloc[0]) == 1


def test_blocked_editdist_matches_duckdb(ray_session):
    import duckdb

    from raqc_ray.ops.editdist import blocked_editdist_pairs

    rng = np.random.default_rng(4)
    alphabet = list("abcdef ")
    rows = []
    for i in range(400):
        rows.append({
            "id": i,
            "txt": "".join(rng.choice(alphabet,
                                      rng.integers(0, 30))),
            "blk": str(rng.integers(0, 8)),
        })
    df = pd.DataFrame(rows)
    got = (blocked_editdist_pairs(rd.from_pandas(df).repartition(6),
                                  "id", "txt", "blk",
                                  max_dist=6, prefix_len=16)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("d", df)
    want = con.execute("""
        SELECT a.id AS a, b.id AS b,
               levenshtein(substr(a.txt, 1, 16), substr(b.txt, 1, 16))
                   AS dist
        FROM d a JOIN d b ON a.blk = b.blk AND a.id < b.id
        WHERE levenshtein(substr(a.txt, 1, 16), substr(b.txt, 1, 16)) <= 6
        ORDER BY a, b
    """).df()
    assert len(got) == len(want)
    assert np.array_equal(got["a"].to_numpy(np.int64),
                          want["a"].to_numpy(np.int64))
    assert np.array_equal(got["dist"].to_numpy(np.int64),
                          want["dist"].to_numpy(np.int64))


def test_blocked_editdist_hot_group_guard(ray_session):
    from raqc_ray.ops.editdist import blocked_editdist_pairs

    df = pd.DataFrame({
        "id": np.arange(50, dtype=np.int64),
        "txt": ["x"] * 50,
        "blk": ["hot"] * 50,
    })
    with pytest.raises(Exception) as ei:
        blocked_editdist_pairs(rd.from_pandas(df).repartition(4),
                               "id", "txt", "blk", max_dist=2,
                               max_group=10).to_pandas()
    assert "max_group" in str(ei.value)


def test_unpivot_roundtrip(ray_session):
    from raqc_ray.ops.pivot import unpivot

    df = pd.DataFrame({
        "k": np.arange(100, dtype=np.int64),
        "m1": np.arange(100, dtype=np.float64),
        "m2": np.arange(100, 200, dtype=np.float64),
    })
    got = (unpivot(rd.from_pandas(df).repartition(5), ["k"], ["m1", "m2"])
           .to_pandas())
    assert len(got) == 200
    wide = got.pivot(index="k", columns="measure",
                     values="value").reset_index()
    assert np.allclose(wide["m1"], df["m1"])
    assert np.allclose(wide["m2"], df["m2"])


def test_grouped_weighted_avg_exact(ray_session):
    from raqc_ray.ops.moments import grouped_weighted_avg

    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], 500),
        "v": rng.integers(-1000, 1000, 500).astype(np.int64),
        "w": rng.integers(1, 50, 500).astype(np.int64),
    })
    got = (grouped_weighted_avg(rd.from_pandas(df).repartition(7),
                                "g", "v", "w")
           .to_pandas().set_index("g"))
    for g, sub in df.groupby("g"):
        want = (sub["v"] * sub["w"]).sum() / sub["w"].sum()
        assert got.loc[g, "wavg"] == np.round(want, 6)
        assert int(got.loc[g, "sum_w"]) == int(sub["w"].sum())


def test_grouped_quantile_cont_matches_numpy(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_quantile_cont

    rng = np.random.default_rng(6)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 2000),
        "v": rng.integers(0, 100, 2000).astype(np.float64),
    })
    got = (grouped_quantile_cont(rd.from_pandas(df).repartition(8),
                                 "g", "v", qs=(0.25, 0.5, 0.75))
           .to_pandas().set_index("g"))
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        for q, col in [(0.25, "q0_25"), (0.5, "q0_5"), (0.75, "q0_75")]:
            # numpy 'linear' interpolation == SQL quantile_cont
            assert got.loc[g, col] == np.quantile(v, q), (g, q)


def test_reconciliation_missing_child_and_topn(ray_session):
    from raqc_ray.ops.consistency import reconciliation_topn

    parent = pd.DataFrame({
        "k": np.array([1, 2, 3, 4], dtype=np.int64),
        "declared": np.array([100, 200, 300, 50], dtype=np.int64),
    })
    child = pd.DataFrame({
        "k": np.array([1, 1, 2, 3], dtype=np.int64),
        "units": np.array([600, 390, 2100, 3000], dtype=np.int64),
    })
    # scale 10: declared_units = 1000, 2000, 3000, 500
    # child sums:                 990,  2100, 3000, 0(missing)
    # rel tol 5% (1/20): dev 10 (1.0%) ok; 100 (5.0%) not > 5%;
    # 0 ok; 500 (100%) flagged
    got = reconciliation_topn(rd.from_pandas(parent), "k", "declared",
                              rd.from_pandas(child), "k", "units",
                              scale=10, tol_num=1, tol_den=20, n_top=5)
    assert list(got["k"].astype(int)) == [4]
    assert int(got["dev"].iloc[0]) == 500
    assert int(got["child_units"].iloc[0]) == 0


def test_grouped_norm_stats_exact(ray_session):
    import pyarrow as pa

    from raqc_ray.ops.embstats import grouped_norm_stats

    rng = np.random.default_rng(8)
    n, dim = 300, 16
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    lab = rng.integers(0, 4, n).astype(np.int64)
    tbl = pa.table({
        "label": pa.array(lab),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
    })
    got = (grouped_norm_stats(rd.from_arrow(tbl), "label", "embedding",
                              dim=dim).to_pandas().set_index("label"))
    # reference: sequential sum of squares, float64
    ss = np.zeros(n)
    for j in range(dim):
        ss += emb[:, j].astype(np.float64) * emb[:, j].astype(np.float64)
    q = np.floor(np.sqrt(ss) * 1_000_000).astype(np.int64)
    for g in np.unique(lab):
        m = lab == g
        assert int(got.loc[g, "sum_norm_q"]) == int(q[m].sum())
        assert int(got.loc[g, "n"]) == int(m.sum())
