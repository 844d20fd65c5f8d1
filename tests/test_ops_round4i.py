"""Unit gates for the round-4i operators: audience-overlap masks,
chi-square independence, activity coverage."""

import numpy as np
import pandas as pd
import pytest


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


# ---------------------------------------------------------- membership


def test_membership_masks_known(ray_session):
    from raqc_ray.ops.setops import membership_mask_counts

    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3, 4, 4, 4, 4],
        "c": ["a", "b", "a", "a", "a", "b", "a", "b", "c", "c"],
    })
    out = (membership_mask_counts(_ds(df, 3), "u", "c",
                                  {"a": 1, "b": 2, "c": 4})
           .to_pandas().set_index("mask").sort_index())
    # u1: {a,b}=3, u2: {a}=1, u3: {b}=2, u4: {a,b,c}=7
    assert out["n_entities"].to_dict() == {1: 1, 2: 1, 3: 1, 7: 1}


def test_membership_masks_duplicates_counted_once(ray_session):
    from raqc_ray.ops.setops import membership_mask_counts

    df = pd.DataFrame({"u": [9] * 30, "c": ["a"] * 15 + ["b"] * 15})
    out = membership_mask_counts(_ds(df, 5), "u", "c",
                                 {"a": 1, "b": 2}).to_pandas()
    assert out["mask"].tolist() == [3]
    assert out["n_entities"].tolist() == [1]


def test_membership_masks_unmapped_raises(ray_session):
    from raqc_ray.ops.setops import membership_mask_counts

    df = pd.DataFrame({"u": [1], "c": ["zz"]})
    with pytest.raises(Exception):
        membership_mask_counts(_ds(df, 1), "u", "c",
                               {"a": 1}).to_pandas()


# ---------------------------------------------------------------- chi2


def _chi2_brute(df, a, b, scale=10 ** 6):
    cells = df.groupby([a, b]).size()
    ra = df.groupby(a).size()
    cb = df.groupby(b).size()
    n = len(df)
    tot = 0
    for av, r in ra.items():
        for bv, c in cb.items():
            o = int(cells.get((av, bv), 0))
            tot += (scale * (o * n - int(r) * int(c)) ** 2) \
                // (int(r) * int(c) * n)
    return tot


def test_chi2_brute(ray_session):
    from raqc_ray.ops.contingency import chi_square_independence

    rng = np.random.default_rng(71)
    df = pd.DataFrame({"a": rng.choice(["x", "y", "z"], 500),
                       "b": rng.integers(0, 4, 500)})
    out = chi_square_independence(_ds(df, 4), "a", "b").to_pandas()
    assert out["chi2"].iloc[0] == _chi2_brute(df, "a", "b")
    assert out["n"].iloc[0] == 500
    assert out["dof"].iloc[0] == (3 - 1) * (4 - 1)


def test_chi2_perfect_dependence_matches_textbook(ray_session):
    from raqc_ray.ops.contingency import chi_square_independence

    # a == b exactly: chi2 = n·(k−1) for a k×k identity table
    df = pd.DataFrame({"a": list(range(4)) * 25})
    df["b"] = df["a"]
    out = chi_square_independence(_ds(df, 2), "a", "b").to_pandas()
    # 100·(4−1)·10⁶, up to per-cell floors
    assert abs(out["chi2"].iloc[0] - 100 * 3 * 10 ** 6) <= 16


def test_chi2_counts_absent_cells(ray_session):
    from raqc_ray.ops.contingency import chi_square_independence

    # one absent cell (x, 1): its expected mass must contribute
    df = pd.DataFrame({"a": ["x", "x", "y", "y", "y"],
                       "b": [0, 0, 0, 1, 1]})
    out = chi_square_independence(_ds(df, 2), "a", "b").to_pandas()
    assert out["chi2"].iloc[0] == _chi2_brute(df, "a", "b")
    assert out["cells"].iloc[0] == 3  # observed, not grid, cells


# ------------------------------------------------------------- coverage


def test_activity_coverage_brute(ray_session):
    from raqc_ray.ops.cohort import activity_coverage

    rng = np.random.default_rng(73)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 60 * 86400, n), unit="s"),
    })
    out = (activity_coverage(_ds(df, 4), "user_id", "ts").to_pandas()
           .set_index("user_id").sort_index())
    day = (df["ts"].astype("datetime64[us]").astype("int64")
           // 86_400_000_000)
    b = pd.DataFrame({"u": df["user_id"], "day": day}).drop_duplicates()
    for u, g in b.groupby("u"):
        act = len(g)
        span = int(g["day"].max() - g["day"].min() + 1)
        assert out.loc[u, "days_active"] == act
        assert out.loc[u, "span_days"] == span
        assert out.loc[u, "cover"] == act * 10 ** 6 // span


def test_activity_coverage_single_day_is_full(ray_session):
    from raqc_ray.ops.cohort import activity_coverage

    df = pd.DataFrame({"user_id": [1, 1],
                       "ts": pd.to_datetime(["2024-01-01 03:00",
                                             "2024-01-01 20:00"])})
    out = activity_coverage(_ds(df, 1), "user_id", "ts").to_pandas()
    assert out["cover"].tolist() == [10 ** 6]
    assert out["span_days"].tolist() == [1]


# ----------------------------------------------------------------- auc


def test_auc_brute(ray_session):
    from raqc_ray.ops.rankcorr import grouped_auc

    rng = np.random.default_rng(79)
    n = 600
    df = pd.DataFrame({"k": rng.integers(0, 3, n),
                       "lab": rng.integers(0, 2, n).astype(np.int64),
                       "s": rng.integers(0, 30, n).astype(np.int64)})
    out = (grouped_auc(_ds(df, 4), "k", "lab", "s").to_pandas()
           .set_index("k").sort_index())
    for k, g in df.groupby("k"):
        # independent check: tie-aware pair counting
        pos = g[g["lab"] == 1]["s"].to_numpy()
        neg = g[g["lab"] == 0]["s"].to_numpy()
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        expect = (10 ** 6 * (2 * int(wins) + int(ties))) \
            // (2 * len(pos) * len(neg))
        assert out.loc[k, "auc"] == expect
        assert out.loc[k, "n_pos"] == len(pos)
        assert out.loc[k, "n_neg"] == len(neg)


def test_auc_perfect_separation(ray_session):
    from raqc_ray.ops.rankcorr import grouped_auc

    df = pd.DataFrame({"k": [0] * 10,
                       "lab": [0] * 5 + [1] * 5,
                       "s": list(range(5)) + list(range(10, 15))})
    out = grouped_auc(_ds(df, 2), "k", "lab", "s").to_pandas()
    assert out["auc"].tolist() == [10 ** 6]


def test_auc_single_class_is_zero(ray_session):
    from raqc_ray.ops.rankcorr import grouped_auc

    df = pd.DataFrame({"k": [0] * 6, "lab": [1] * 6,
                       "s": list(range(6))})
    out = grouped_auc(_ds(df, 2), "k", "lab", "s").to_pandas()
    assert out["auc"].tolist() == [0]
