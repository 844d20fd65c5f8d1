"""Randomized equivalence tests: each sort-scan operator vs an
independent pandas reference implementation (merge_asof, brute-force
band join, groupby-apply) over seeded random data with duplicate
timestamps and skewed keys — the failure modes planted fixtures can
miss. Seeds are fixed so runs are deterministic."""

import numpy as np
import pandas as pd
import pytest


def _rand_events(seed, n=400, keys=12, tmax_min=5000):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, keys, n),
            "t": pd.to_datetime("2024-01-01")
            # coarse grid → plenty of exact-duplicate timestamps
            + pd.to_timedelta(rng.integers(0, tmax_min, n) * 7, unit="m"),
            "id": np.arange(n),
            "v": np.round(rng.random(n) * 100, 2),
        }
    )


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_matches_merge_asof(rd, seed):
    from raqc_ray.ops.asof import asof_join

    left = _rand_events(seed, n=300).rename(
        columns={"t": "lt", "id": "lid", "v": "lv"}
    )
    right = _rand_events(seed + 100, n=200).rename(
        columns={"k": "rk", "t": "rt", "id": "rid", "v": "rv"}
    )
    got = (
        asof_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(3),
            on="k", left_ts="lt", right_ts="rt", right_on="rk",
            tiebreak="rid",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # reference: merge_asof picks the LAST right row among equal rt in
    # frame order, so pre-sorting right by (rt, rid) reproduces the
    # operator's max-tiebreak contract; inner semantics via dropna
    ref = (
        pd.merge_asof(
            left.sort_values(["lt", "lid"], kind="mergesort"),
            right.sort_values(["rt", "rid"], kind="mergesort"),
            left_on="lt", right_on="rt", left_by="k", right_by="rk",
            direction="backward", allow_exact_matches=True,
        )
        .dropna(subset=["rid"])
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert got["lid"].tolist() == ref["lid"].tolist()
    assert got["rid"].tolist() == [int(x) for x in ref["rid"]]
    assert got["rv"].tolist() == [float(x) for x in ref["rv"]]


@pytest.mark.parametrize("seed", [3, 4])
def test_interval_join_matches_bruteforce(rd, seed):
    from raqc_ray.ops.rangejoin import interval_join

    left = _rand_events(seed, n=150, keys=8).rename(
        columns={"t": "lt", "id": "lid", "v": "lv"}
    )
    right = _rand_events(seed + 50, n=150, keys=8).rename(
        columns={"k": "rk", "t": "rt", "id": "rid", "v": "rv"}
    )
    lower, upper = pd.Timedelta("0h"), pd.Timedelta("26h")
    got = (
        interval_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(4),
            on="k", left_ts="lt", right_ts="rt", right_on="rk",
            lower=lower, upper=upper,
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    cross = left.merge(right, left_on="k", right_on="rk")
    d = cross["lt"] - cross["rt"]
    ref = (
        cross[(d >= lower) & (d <= upper)]
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    assert got[["lid", "rid"]].values.tolist() == \
        ref[["lid", "rid"]].values.tolist()


@pytest.mark.parametrize("seed", [5, 6])
def test_sessionize_matches_groupby_apply(rd, seed):
    from raqc_ray.ops.sessions import sessionize

    ev = _rand_events(seed, n=350, keys=10)
    gap = pd.Timedelta("3h")
    res = sessionize(
        rd.from_pandas(ev).repartition(5), "k", "t", gap,
        value_col="v", tiebreak="id",
    )
    got = (
        res.to_pandas()
        .astype({"k": "int64", "session_id": "int64", "n_events": "int64",
                 # the op's arrow schema is timestamp[us]; the pandas
                 # oracle below stays in ns — compare in ns
                 "session_start": "datetime64[ns]",
                 "session_end": "datetime64[ns]"})
        .sort_values(["k", "session_id"])
        .reset_index(drop=True)
    )

    frames = []
    for k, g in ev.sort_values(["t", "id"]).groupby("k"):
        new = g["t"].diff().isna() | (g["t"].diff() > gap)
        sid = new.cumsum()
        agg = g.groupby(sid).agg(
            session_start=("t", "min"), session_end=("t", "max"),
            n_events=("t", "size"), sum_value=("v", "sum"),
        )
        agg.insert(0, "k", k)
        agg.insert(1, "session_id", np.arange(1, len(agg) + 1))
        frames.append(agg)
    ref = pd.concat(frames, ignore_index=True).astype(
        {"k": "int64", "session_id": "int64", "n_events": "int64"}
    )
    pd.testing.assert_frame_equal(
        got[ref.columns.tolist()], ref, check_exact=False, rtol=1e-9
    )


@pytest.mark.parametrize("seed", [7, 8])
def test_grouped_running_matches_pandas_window(rd, seed):
    from raqc_ray.ops.window import grouped_running

    ev = _rand_events(seed, n=300, keys=9)
    res = grouped_running(
        rd.from_pandas(ev).repartition(4), key="k", order_by="t",
        value_col="v", tiebreak="id",
    )
    got = (
        res.to_pandas()
        .astype({"k": "int64", "id": "int64", "row_number": "int64"})
        .sort_values("id")
        .reset_index(drop=True)
    )
    s = ev.sort_values(["t", "id"], kind="mergesort")
    ref = s.copy()
    ref["row_number"] = s.groupby("k").cumcount() + 1
    ref["running_sum"] = np.round(s.groupby("k")["v"].cumsum(), 4)
    ref["gap_ms"] = (
        s.groupby("k")["t"].diff().dt.total_seconds() * 1000.0
    )
    ref = ref.sort_values("id").reset_index(drop=True)
    assert got["row_number"].tolist() == ref["row_number"].tolist()
    np.testing.assert_allclose(got["running_sum"], ref["running_sum"])
    np.testing.assert_allclose(got["gap_ms"], ref["gap_ms"])
