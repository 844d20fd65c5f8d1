"""Unit gates for the round-4f operators: grouped Gini / HHI,
cohort retention, 2-D skyline, run-length segments, inter-arrival
stats.  Each op is checked against an independent brute-force pandas
computation and, where layout can matter, across block counts."""

import numpy as np
import pandas as pd


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


# ---------------------------------------------------------------- gini


def _gini_brute(v):
    """Textbook rank formula over the ascending sort, Python ints."""
    xs = sorted(int(x) for x in v)
    n = len(xs)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    den = n * sum(xs)
    return (10 ** 9 * num) // den if den else 0


def test_gini_known_and_brute(ray_session):
    from raqc_ray.ops.inequality import grouped_gini

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, 500),
        "v": rng.integers(0, 10_000, 500).astype(np.int64),
    })
    out = (grouped_gini(_ds(df), "k", "v").to_pandas()
           .set_index("k").sort_index())
    for k, g in df.groupby("k"):
        assert out.loc[k, "gini"] == _gini_brute(g["v"])
        assert out.loc[k, "n"] == len(g)
        assert out.loc[k, "total"] == int(g["v"].sum())


def test_gini_extremes(ray_session):
    from raqc_ray.ops.inequality import grouped_gini

    # perfectly equal values → gini 0; all mass on one holder → → 1
    df = pd.DataFrame({"k": [0] * 10 + [1] * 10,
                       "v": [5] * 10 + [0] * 9 + [100]})
    out = (grouped_gini(_ds(df, 2), "k", "v").to_pandas()
           .set_index("k"))
    assert out.loc[0, "gini"] == 0
    assert out.loc[1, "gini"] == 900_000_000  # (n-1)/n scaled


def test_gini_layout_invariant(ray_session):
    from raqc_ray.ops.inequality import grouped_gini

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 3, 300),
                       "v": rng.integers(0, 10 ** 7, 300)})
    a = (grouped_gini(_ds(df, 1), "k", "v").to_pandas()
         .sort_values("k").reset_index(drop=True))
    b = (grouped_gini(_ds(df.iloc[::-1], 7), "k", "v").to_pandas()
         .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ----------------------------------------------------------------- hhi


def test_hhi_brute(ray_session):
    from raqc_ray.ops.inequality import grouped_hhi

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"g": rng.integers(0, 5, 200),
                       "c": rng.integers(1, 50, 200).astype(np.int64)})
    out = (grouped_hhi(_ds(df), "g", "c").to_pandas()
           .set_index("g").sort_index())
    for k, g in df.groupby("g"):
        s1 = int(g["c"].sum())
        s2 = int((g["c"].astype(object) ** 2).sum())
        assert out.loc[k, "hhi"] == (10 ** 8 * s2) // (s1 * s1)
        assert out.loc[k, "k"] == len(g)
        assert out.loc[k, "total"] == s1


def test_hhi_monopoly_is_full_scale(ray_session):
    from raqc_ray.ops.inequality import grouped_hhi

    df = pd.DataFrame({"g": [1], "c": [42]})
    out = grouped_hhi(_ds(df, 1), "g", "c").to_pandas()
    assert out["hhi"].iloc[0] == 10 ** 8


# -------------------------------------------------------------- cohort


def test_cohort_retention_brute(ray_session):
    from raqc_ray.ops.cohort import cohort_retention

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
    })
    out = (cohort_retention(_ds(df, 4), "user_id", "ts").to_pandas()
           .sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))

    day = (df["ts"].astype("datetime64[us]").astype("int64")
           // 86_400_000_000).astype(int)
    b = pd.DataFrame({"u": df["user_id"], "day": day})
    b["cohort_day"] = b.groupby("u")["day"].transform("min")
    b["day_offset"] = b["day"] - b["cohort_day"]
    exp = (b[["u", "cohort_day", "day_offset"]].drop_duplicates()
           .groupby(["cohort_day", "day_offset"]).size()
           .reset_index(name="users")
           .sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp.astype("int64"))
    # offset-0 cell of each cohort counts every user of that cohort
    zero = out[out["day_offset"] == 0].set_index("cohort_day")["users"]
    sizes = b.drop_duplicates("u").groupby("cohort_day").size()
    assert zero.sort_index().tolist() == sizes.sort_index().tolist()


# ------------------------------------------------------------- skyline


def _skyline_brute(df, x, y):
    keep = []
    for i, r in df.iterrows():
        dom = ((df[x] <= r[x]) & (df[y] >= r[y])
               & ((df[x] < r[x]) | (df[y] > r[y]))).any()
        if not dom:
            keep.append(i)
    return df.loc[keep]


def test_skyline_brute_equivalence(ray_session):
    from raqc_ray.ops.skyline import skyline2d

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"id": np.arange(300),
                       "x": rng.integers(0, 40, 300),
                       "y": rng.integers(0, 40, 300)})
    out = (skyline2d(_ds(df, 5), "x", "y").to_pandas()
           .sort_values("id").reset_index(drop=True))
    exp = (_skyline_brute(df, "x", "y")
           .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_skyline_keeps_duplicate_front_points(ray_session):
    from raqc_ray.ops.skyline import skyline2d

    df = pd.DataFrame({"id": [1, 2, 3],
                       "x": [0, 0, 5], "y": [9, 9, 1]})
    out = skyline2d(_ds(df, 2), "x", "y").to_pandas()
    assert sorted(out["id"].tolist()) == [1, 2]


# ---------------------------------------------------------------- runs


def _runs_brute(df):
    rows = []
    for u, g in df.groupby("user_id"):
        s = g.sort_values(["ts", "event_id"], kind="mergesort")
        run_idx = 0
        prev = object()
        for _, r in s.iterrows():
            if r["event_type"] != prev:
                run_idx += 1
                rows.append([u, run_idx, r["event_type"],
                             r["event_id"], 0])
                prev = r["event_type"]
            rows[-1][4] += 1
    return pd.DataFrame(rows, columns=["user_id", "run_idx",
                                       "event_type", "start_id", "n"])


def test_run_length_segments_brute(ray_session):
    from raqc_ray.ops.runs import run_length_segments

    rng = np.random.default_rng(17)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c"], n),
        "event_id": np.arange(n, dtype=np.int64),
    })
    out = (run_length_segments(_ds(df, 4), "user_id", "ts",
                               "event_type", "event_id").to_pandas()
           .sort_values(["user_id", "run_idx"]).reset_index(drop=True))
    exp = (_runs_brute(df)
           .sort_values(["user_id", "run_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype({"user_id": "int64"}),
                                  exp.astype({"user_id": "int64"}),
                                  check_dtype=False)


def test_run_length_single_run(ray_session):
    from raqc_ray.ops.runs import run_length_segments

    df = pd.DataFrame({"user_id": [1, 1, 1],
                       "ts": pd.to_datetime(["2024-01-01", "2024-01-02",
                                             "2024-01-03"]),
                       "event_type": ["x", "x", "x"],
                       "event_id": [10, 11, 12]})
    out = run_length_segments(_ds(df, 1), "user_id", "ts",
                              "event_type", "event_id").to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n"] == 3 and out.iloc[0]["start_id"] == 10


# --------------------------------------------------------- interarrival


def test_interarrival_brute(ray_session):
    from raqc_ray.ops.runs import interarrival_stats

    rng = np.random.default_rng(19)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
    })
    out = (interarrival_stats(_ds(df, 4), "user_id", "ts", "event_id")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    rows = []
    for u, g in df.groupby("user_id"):
        t = (g.sort_values(["ts", "event_id"])["ts"]
             .astype("datetime64[us]").astype("int64").to_numpy())
        d = np.diff(t)
        rows.append([u, len(t), len(d),
                     int(d.min()) if len(d) else 0,
                     int(d.max()) if len(d) else 0,
                     int(d.sum()) if len(d) else 0])
    exp = pd.DataFrame(rows, columns=["user_id", "n_events", "n_gaps",
                                      "gap_min", "gap_max", "gap_sum"])
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  exp.astype("int64"))


def test_interarrival_singleton_user(ray_session):
    from raqc_ray.ops.runs import interarrival_stats

    df = pd.DataFrame({"user_id": [5],
                       "ts": pd.to_datetime(["2024-01-01"]),
                       "event_id": [0]})
    out = interarrival_stats(_ds(df, 1), "user_id", "ts",
                             "event_id").to_pandas()
    assert out.iloc[0]["n_gaps"] == 0 and out.iloc[0]["gap_sum"] == 0


# ------------------------------------------------------- percent rank


def test_percent_rank_brute(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_percent_rank

    rng = np.random.default_rng(23)
    df = pd.DataFrame({"k": rng.integers(0, 4, 300),
                       "v": rng.integers(0, 20, 300).astype(np.int64)})
    out = (grouped_percent_rank(_ds(df, 4), "k", "v").to_pandas()
           .sort_values(["k", "v"]).reset_index(drop=True))
    rows = []
    for k, g in df.groupby("k"):
        n = len(g)
        vc = g["v"].value_counts().sort_index()
        before = 0
        for v, c in vc.items():
            pr = before * 10 ** 6 // (n - 1) if n > 1 else 0
            rows.append([k, v, c, pr])
            before += c
    exp = (pd.DataFrame(rows, columns=["k", "v", "cnt", "pr"])
           .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  exp.astype("int64"))


def test_percent_rank_singleton_key(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_percent_rank

    df = pd.DataFrame({"k": [9], "v": [5]})
    out = grouped_percent_rank(_ds(df, 1), "k", "v").to_pandas()
    assert out["pr"].tolist() == [0] and out["cnt"].tolist() == [1]


# ---------------------------------------------------- degree histogram


def test_degree_histogram_known_graph(ray_session):
    import ray.data as rd

    from raqc_ray.ops.concomp import degree_histogram

    # path 1-2-3 plus edge 4-5: degrees 1,2,1,1,1 → {1: 4, 2: 1}
    pairs = rd.from_pandas(pd.DataFrame(
        {"a": [1, 2, 4], "b": [2, 3, 5]})).repartition(2)
    out = (degree_histogram(pairs).to_pandas()
           .sort_values("degree").reset_index(drop=True))
    assert out["degree"].tolist() == [1, 2]
    assert out["n_nodes"].tolist() == [4, 1]


def test_degree_histogram_layout_invariant(ray_session):
    import ray.data as rd

    from raqc_ray.ops.concomp import degree_histogram

    rng = np.random.default_rng(29)
    a = rng.integers(0, 50, 400)
    b = rng.integers(50, 100, 400)
    df = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
    one = (degree_histogram(rd.from_pandas(df).repartition(1))
           .to_pandas().sort_values("degree").reset_index(drop=True))
    many = (degree_histogram(rd.from_pandas(df.iloc[::-1]).repartition(7))
            .to_pandas().sort_values("degree").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)


# ------------------------------------------------------------ spearman


def test_spearman_brute(ray_session):
    from raqc_ray.ops.rankcorr import grouped_spearman

    rng = np.random.default_rng(31)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 3, n),
        "x": rng.integers(0, 15, n).astype(np.int64),
    })
    # correlated-with-ties y, plus noise
    df["y"] = (df["x"] * 3 + rng.integers(0, 20, n)).astype(np.int64)
    out = (grouped_spearman(_ds(df, 4), "k", "x", "y").to_pandas()
           .set_index("k").sort_index())
    for k, g in df.groupby("k"):
        rx = g["x"].rank(method="average").to_numpy()
        ry = g["y"].rank(method="average").to_numpy()
        exp = np.corrcoef(rx, ry)[0, 1]
        assert abs(out.loc[k, "rho"] - exp) < 1e-12
        assert out.loc[k, "n"] == len(g)


def test_spearman_perfect_and_constant(ray_session):
    from raqc_ray.ops.rankcorr import grouped_spearman

    df = pd.DataFrame({
        "k": [0] * 5 + [1] * 5 + [2] * 5,
        "x": list(range(5)) * 3,
        "y": (list(range(5))                     # monotone ↑ → +1
              + list(range(5, 0, -1))            # monotone ↓ → −1
              + [7] * 5),                        # constant → 0
    })
    out = (grouped_spearman(_ds(df, 2), "k", "x", "y").to_pandas()
           .set_index("k").sort_index())
    assert out.loc[0, "rho"] == 1.0
    assert out.loc[1, "rho"] == -1.0
    assert out.loc[2, "rho"] == 0.0


def test_spearman_auc_join_regime_equivalence(ray_session):
    """broadcast_limit=0 forces the join-regime fallback (now on the
    sorted-block composite-key grouped_sums) — results must be
    bit-identical to the broadcast regime."""
    from raqc_ray.ops.rankcorr import grouped_auc, grouped_spearman

    rng = np.random.default_rng(41)
    n = 600
    df = pd.DataFrame({"k": rng.integers(0, 4, n),
                       "x": rng.integers(0, 12, n),
                       "y": rng.integers(0, 12, n),
                       "lab": rng.integers(0, 2, n)})
    a = (grouped_spearman(_ds(df, 5), "k", "x", "y").to_pandas()
         .sort_values("k").reset_index(drop=True))
    b = (grouped_spearman(_ds(df, 5), "k", "x", "y",
                          broadcast_limit=0).to_pandas()
         .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    a2 = (grouped_auc(_ds(df, 5), "k", "lab", "x").to_pandas()
          .sort_values("k").reset_index(drop=True))
    b2 = (grouped_auc(_ds(df, 5), "k", "lab", "x",
                      broadcast_limit=0).to_pandas()
          .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(a2, b2)


def test_spearman_layout_invariant(ray_session):
    from raqc_ray.ops.rankcorr import grouped_spearman

    rng = np.random.default_rng(37)
    df = pd.DataFrame({"k": rng.integers(0, 2, 200),
                       "x": rng.integers(0, 10, 200),
                       "y": rng.integers(0, 10, 200)})
    a = (grouped_spearman(_ds(df, 1), "k", "x", "y").to_pandas()
         .sort_values("k").reset_index(drop=True))
    b = (grouped_spearman(_ds(df.iloc[::-1], 6), "k", "x", "y")
         .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)   # bit-identical floats
