"""Unit gates for the round-4h operators: forward-fill resampling,
rapid-repeat suppression, grouped tail sums."""

import numpy as np
import pandas as pd


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


_H = 3_600_000_000


# ------------------------------------------------------------- resample


def test_resample_ffill_known(ray_session):
    from raqc_ray.ops.resample import resample_ffill

    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50",
                         "2024-01-01 03:20"])
    df = pd.DataFrame({"k": [1, 1, 1], "ts": ts,
                       "v": np.array([10, 20, 99], dtype=np.int64),
                       "tie": np.array([0, 1, 2], dtype=np.int64)})
    out = (resample_ffill(_ds(df, 2), "k", "ts", "v", "tie")
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    # hours 0..3: hour0 closes at 20, hours 1-2 carry 20, hour3 = 99
    assert out["value"].tolist() == [20, 20, 20, 99]
    assert len(out) == 4


def test_resample_ffill_tie_timestamp_uses_tiebreak(ray_session):
    from raqc_ray.ops.resample import resample_ffill

    ts = pd.to_datetime(["2024-01-01 00:10"] * 2)
    df = pd.DataFrame({"k": [5, 5], "ts": ts,
                       "v": np.array([7, 3], dtype=np.int64),
                       "tie": np.array([1, 2], dtype=np.int64)})
    out = resample_ffill(_ds(df, 1), "k", "ts", "v", "tie").to_pandas()
    assert out["value"].tolist() == [3]   # higher tie wins the bucket


def test_resample_ffill_brute(ray_session):
    from raqc_ray.ops.resample import resample_ffill

    rng = np.random.default_rng(59)
    n = 300
    df = pd.DataFrame({
        "k": rng.integers(0, 6, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 48 * 3600, n), unit="s"),
        "v": rng.integers(0, 100, n).astype(np.int64),
        "tie": np.arange(n, dtype=np.int64),
    })
    out = (resample_ffill(_ds(df, 4), "k", "ts", "v", "tie")
           .to_pandas().sort_values(["k", "bucket"])
           .reset_index(drop=True))
    rows = []
    for k, g in df.groupby("k"):
        s = g.sort_values(["ts", "tie"], kind="mergesort")
        t = s["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        b = t // _H
        lastv = {}
        for bi, vi in zip(b, s["v"]):
            lastv[bi] = vi
        cur = None
        for bucket in range(int(b.min()), int(b.max()) + 1):
            if bucket in lastv:
                cur = lastv[bucket]
            rows.append([k, bucket, cur])
    exp = (pd.DataFrame(rows, columns=["k", "bucket", "value"])
           .sort_values(["k", "bucket"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  exp.astype("int64"))


# ------------------------------------------------------------- debounce


def test_debounce_known(ray_session):
    from raqc_ray.ops.runs import suppress_rapid_repeats

    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:30",
                         "2024-01-01 00:02:00", "2024-01-01 00:02:30"])
    df = pd.DataFrame({"u": [1] * 4, "ts": ts,
                       "id": np.arange(4, dtype=np.int64)})
    out = (suppress_rapid_repeats(_ds(df, 2), "u", "ts", "id",
                                  gap_us=60_000_000)
           .to_pandas().sort_values("id"))
    # 0 kept; 1 within 60s of 0 → dropped; 2 kept (90s after 1);
    # 3 within 60s of 2 → dropped
    assert out["id"].tolist() == [0, 2]


def test_debounce_brute_multikey(ray_session):
    from raqc_ray.ops.runs import suppress_rapid_repeats

    rng = np.random.default_rng(61)
    n = 400
    df = pd.DataFrame({
        "u": rng.integers(0, 10, n),
        "g": rng.choice(["a", "b"], n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 3600, n), unit="s"),
        "id": np.arange(n, dtype=np.int64),
    })
    gap = 120_000_000
    out = (suppress_rapid_repeats(_ds(df, 4), ["u", "g"], "ts", "id",
                                  gap_us=gap)
           .to_pandas().sort_values("id").reset_index(drop=True))
    keep_ids = []
    for _, g in df.groupby(["u", "g"]):
        s = g.sort_values(["ts", "id"], kind="mergesort")
        t = s["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        k = np.ones(len(s), dtype=bool)
        k[1:] = (t[1:] - t[:-1]) > gap
        keep_ids.extend(s["id"].to_numpy()[k].tolist())
    assert out["id"].tolist() == sorted(keep_ids)


# ------------------------------------------------------------- tail sum


def test_tail_sum_brute(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_tail_sum

    import math

    rng = np.random.default_rng(67)
    df = pd.DataFrame({"k": rng.integers(0, 4, 500),
                       "v": rng.integers(0, 1000, 500).astype(np.int64)})
    out = (grouped_tail_sum(_ds(df, 4), "k", "v", q=0.9).to_pandas()
           .set_index("k").sort_index())
    for k, g in df.groupby("k"):
        xs = np.sort(g["v"].to_numpy())
        n = len(xs)
        cut = xs[max(1, math.ceil(0.9 * n)) - 1]
        tail = xs[xs > cut]
        assert out.loc[k, "cut"] == cut
        assert out.loc[k, "tail_n"] == len(tail)
        assert out.loc[k, "tail_sum"] == int(tail.sum())
        assert out.loc[k, "n"] == n


def test_tail_sum_all_equal_has_empty_tail(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_tail_sum

    df = pd.DataFrame({"k": [0] * 20, "v": [5] * 20})
    out = grouped_tail_sum(_ds(df, 2), "k", "v").to_pandas()
    assert out["tail_n"].tolist() == [0]
    assert out["tail_sum"].tolist() == [0]
    assert out["cut"].tolist() == [5]
