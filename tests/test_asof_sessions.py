"""Planted-fixture unit tests for the sort-scan operator family
(ops/asof.py, ops/sessions.py, ops/topk.py, ops/rangejoin.py — the
oracle harness covers them at sf0.01; these pin the semantics —
inclusive match, tie-breaking, inner drop, singleton sessions,
band edges, and block-boundary groups)."""

import numpy as np
import pandas as pd
import pytest


def _ts(*hours):
    return pd.to_datetime([f"2024-01-01 {h:02d}:00:00" for h in hours])


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def test_asof_basic_semantics(rd):
    from raqc_ray.ops.asof import asof_join

    left = pd.DataFrame(
        {"k": [1, 1, 1, 2, 3], "lt": _ts(1, 5, 9, 4, 2), "lv": [10, 11, 12, 13, 14]}
    )
    right = pd.DataFrame(
        {
            "rk": [1, 1, 2, 2, 9],
            "rt": _ts(0, 5, 6, 6, 0),
            # k=2 has two rights at the SAME ts — tiebreak picks rid=4
            "rid": [1, 2, 3, 4, 5],
        }
    )
    out = (
        asof_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            on="k", left_ts="lt", right_ts="rt", right_on="rk",
            tiebreak="rid",
        )
        .to_pandas()
        .sort_values(["k", "lt"])
        .reset_index(drop=True)
    )
    # k=1@01 -> rt=00 (rid 1); k=1@05 -> EXACT ts match is inclusive
    # (rid 2); k=1@09 -> latest prior rid 2; k=2@04 -> no right <= 04
    # dropped (inner); k=3 -> no rights at all, dropped.
    assert out["lv"].tolist() == [10, 11, 12]
    assert out["rid"].tolist() == [1, 2, 2]
    assert list(out.columns) == ["k", "lt", "lv", "rt", "rid"]
    assert out["rid"].dtype == np.int64


def test_asof_tiebreak_and_tolerance(rd):
    from raqc_ray.ops.asof import asof_join

    left = pd.DataFrame({"k": [2, 2], "lt": _ts(7, 23), "lv": [1, 2]})
    right = pd.DataFrame(
        {"rk": [2, 2], "rt": _ts(6, 6), "rid": [3, 4]}
    )
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", left_ts="lt", right_ts="rt", right_on="rk", tiebreak="rid",
    ).to_pandas()
    assert sorted(out["rid"].tolist()) == [4, 4]  # max tiebreak among ties
    out2 = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", left_ts="lt", right_ts="rt", right_on="rk", tiebreak="rid",
        tolerance=np.timedelta64(2, "h"),
    ).to_pandas()
    assert out2["lv"].tolist() == [1]  # the 23:00 event is >2h past 06:00


def test_sessionize_planted(rd):
    from raqc_ray.ops.sessions import sessionize

    ev = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 2, 3],
            "t": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:30",  # session 1
                 "2024-01-01 08:00", "2024-01-01 08:10",  # session 2
                 "2024-01-02 00:00",                      # u2 singleton
                 "2024-01-03 00:00"]                      # u3 singleton
            ),
            "v": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
            "eid": [1, 2, 3, 4, 5, 6],
        }
    )
    res = sessionize(
        rd.from_pandas(ev).repartition(3), "u", "t", "6h",
        value_col="v", tiebreak="eid",
    )
    df = res.to_pandas()
    df = df.sort_values(["u", "session_id"]).reset_index(drop=True)
    got = df[["u", "session_id", "n_events", "sum_value"]].astype(
        {"u": "int64", "session_id": "int64", "n_events": "int64"}
    )
    want = pd.DataFrame(
        {"u": [1, 1, 2, 3], "session_id": [1, 2, 1, 1],
         "n_events": [2, 2, 1, 1], "sum_value": [3.0, 12.0, 16.0, 32.0]}
    )
    pd.testing.assert_frame_equal(got, want)
    starts = pd.to_datetime(df["session_start"]).tolist()
    assert starts[0] == pd.Timestamp("2024-01-01 00:00")
    assert starts[1] == pd.Timestamp("2024-01-01 08:00")


def test_sessionize_gap_edge_inclusive(rd):
    """A gap of EXACTLY the threshold does not split (strict >)."""
    from raqc_ray.ops.sessions import sessionize

    ev = pd.DataFrame(
        {"u": [7, 7], "t": _ts(0, 6), "v": [1.0, 1.0], "eid": [1, 2]}
    )
    res = sessionize(rd.from_pandas(ev), "u", "t", "6h",
                          value_col="v", tiebreak="eid")
    df = res.to_pandas()
    assert len(df) == 1 and int(df["n_events"].iloc[0]) == 2


def test_grouped_topk_planted(rd):
    from raqc_ray.ops.topk import grouped_topk

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 3, 3],
            "v": [5.0, 9.0, 9.0, 1.0, 4.0, 2.0, 2.0],
            "id": [10, 11, 12, 13, 20, 30, 31],
        }
    )
    res = grouped_topk(
        rd.from_pandas(df).repartition(4), key="k", order_by="v", k=2,
        ascending=False, tiebreak="id",
    )
    out = (
        res.to_pandas()
        .astype({"k": "int64", "id": "int64", "rank": "int64"})
        .sort_values(["k", "rank"])
        .reset_index(drop=True)
    )
    # k=1: ties at v=9 break by ascending id (11 then 12); k=2 singleton;
    # k=3: tie at v=2 -> ids 30,31
    assert out["id"].tolist() == [11, 12, 20, 30, 31]
    assert out["rank"].tolist() == [1, 2, 1, 1, 2]


def test_grouped_topk_partition_invariant(rd):
    """Output is identical whatever the block layout (the per-block
    prune combiner must not change results)."""
    from raqc_ray.ops.topk import grouped_topk

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 500),
            "v": rng.integers(0, 50, 500).astype("float64"),
            "id": np.arange(500),
        }
    )
    outs = []
    for nparts in (1, 7):
        res = grouped_topk(
            rd.from_pandas(df).repartition(nparts), key="k",
            order_by="v", k=4, ascending=False, tiebreak="id",
        )
        o = (
            res.to_pandas()
            .astype({"k": "int64", "v": "float64", "id": "int64",
                     "rank": "int64"})
            .sort_values(["k", "rank"])
            .reset_index(drop=True)
        )
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_interval_join_planted(rd):
    from raqc_ray.ops.rangejoin import interval_join

    left = pd.DataFrame({"k": [1, 1, 2], "lt": _ts(10, 3, 5),
                         "lid": [100, 101, 102]})
    right = pd.DataFrame(
        {"rk": [1, 1, 1, 2, 2], "rt": _ts(2, 6, 10, 5, 1),
         "rid": [1, 2, 3, 4, 5]}
    )
    out = (
        interval_join(
            rd.from_pandas(left).repartition(2),
            rd.from_pandas(right).repartition(3),
            on="k", left_ts="lt", right_ts="rt", right_on="rk",
            lower="0h", upper="4h",
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    # lid=100 (k=1 @10): band [06,10] -> rids 2,3 (both edges inclusive)
    # lid=101 (k=1 @03): band [-1h..03] -> rid 1
    # lid=102 (k=2 @05): band [01,05] -> rids 4,5
    assert list(zip(out["lid"], out["rid"])) == [
        (100, 2), (100, 3), (101, 1), (102, 4), (102, 5)
    ]
    assert out["rid"].dtype == np.int64

def test_grouped_running_planted(rd):
    from raqc_ray.ops.window import grouped_running

    ev = pd.DataFrame(
        {
            "u": [1, 1, 1, 2],
            "t": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:00",
                                 "2024-01-01 00:01", "2024-01-01 05:00"]),
            "v": [1.5, 2.25, 4.0, 8.0],
            "eid": [2, 1, 3, 4],  # ties at 00:00 break by eid: 1 then 2
        }
    )
    res = grouped_running(
        rd.from_pandas(ev).repartition(3), key="u", order_by="t",
        value_col="v", tiebreak="eid",
    )
    out = (
        res.to_pandas()
        .astype({"u": "int64", "eid": "int64", "row_number": "int64"})
        .sort_values(["u", "row_number"])
        .reset_index(drop=True)
    )
    assert out["eid"].tolist() == [1, 2, 3, 4]
    assert out["running_sum"].tolist() == [2.25, 3.75, 7.75, 8.0]
    assert out["row_number"].tolist() == [1, 2, 3, 1]
    gaps = out["gap_ms"].tolist()
    assert np.isnan(gaps[0]) and np.isnan(gaps[3])  # each key's first row
    assert gaps[1] == 0.0 and gaps[2] == 60_000.0


def test_grouped_running_partition_invariant(rd):
    from raqc_ray.ops.window import grouped_running

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 15, 400),
            "t": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, 400), unit="m"),
            "v": rng.random(400),
            "eid": np.arange(400),
        }
    )
    outs = []
    for nparts in (1, 6):
        res = grouped_running(
            rd.from_pandas(df).repartition(nparts), key="u", order_by="t",
            value_col="v", tiebreak="eid",
        )
        o = (
            res.to_pandas()
            .astype({"u": "int64", "eid": "int64", "row_number": "int64"})
            .sort_values(["u", "row_number"])
            .reset_index(drop=True)[
                ["u", "eid", "row_number", "running_sum", "gap_ms"]
            ]
        )
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_semi_anti_join_planted(rd):
    from raqc_ray.ops.join import anti_join, semi_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    # k=1 matches twice: semi must emit the left row ONCE
    right = pd.DataFrame({"rk": [1, 1, 3], "rv": [7, 8, 9]})
    semi = (
        semi_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", right_on="rk", num_partitions=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert semi["k"].tolist() == [1, 3]
    assert list(semi.columns) == ["k", "lv"]  # left columns only
    anti = (
        anti_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", right_on="rk", num_partitions=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert anti["k"].tolist() == [2, 4]
