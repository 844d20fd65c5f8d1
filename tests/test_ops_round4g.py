"""Unit gates for the round-4g operators: weighted hash sampling,
grouped OHLC bars, sorted-neighborhood candidate pairs."""

import numpy as np
import pandas as pd


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


# ------------------------------------------------------ weighted sample


_M, _A = 2_147_483_647, 48_271


def _lehmer(k, salt):
    return (((k + salt) * _A) % _M) * _A % _M


def test_weighted_sample_matches_predicate(ray_session):
    from raqc_ray.ops.sample import weighted_hash_sample

    rng = np.random.default_rng(41)
    df = pd.DataFrame({"id": np.arange(2000, dtype=np.int64),
                       "w": rng.integers(0, 100, 2000).astype(np.int64)})
    out = (weighted_hash_sample(_ds(df, 4), "id", "w", wmax=100,
                                salt=7).to_pandas()
           .sort_values("id").reset_index(drop=True))
    keep = df[[_lehmer(int(i), 7) * 100 < int(w) * _M
               for i, w in zip(df["id"], df["w"])]]
    assert out["id"].tolist() == keep["id"].tolist()


def test_weighted_sample_extremes(ray_session):
    from raqc_ray.ops.sample import weighted_hash_sample

    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64),
                       "w": np.zeros(500, dtype=np.int64)})
    assert weighted_hash_sample(_ds(df), "id", "w", 10).count() == 0
    df["w"] = 10  # w == wmax ⇒ probability 1
    assert weighted_hash_sample(_ds(df), "id", "w", 10).count() == 500


def test_weighted_sample_layout_invariant(ray_session):
    from raqc_ray.ops.sample import weighted_hash_sample

    rng = np.random.default_rng(43)
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "w": rng.integers(0, 50, 1000).astype(np.int64)})
    a = (weighted_hash_sample(_ds(df, 1), "id", "w", 50).to_pandas()
         .sort_values("id").reset_index(drop=True))
    b = (weighted_hash_sample(_ds(df.iloc[::-1], 9), "id", "w", 50)
         .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------- ohlc


def _ohlc_brute(df, bucket_us=3_600_000_000):
    t = df["ts"].astype("datetime64[us]").astype("int64")
    d = df.assign(__t=t, bucket=t // bucket_us)
    rows = []
    for (k, bk), g in d.groupby(["k", "bucket"]):
        s = g.sort_values(["__t", "tie"], kind="mergesort")
        v = s["v"].to_numpy()
        rows.append([k, bk, v[0], v.max(), v.min(), v[-1],
                     len(v), v.sum()])
    return pd.DataFrame(rows, columns=["k", "bucket", "open", "high",
                                       "low", "close", "n", "vsum"])


def test_ohlc_brute(ray_session):
    from raqc_ray.ops.ohlc import grouped_ohlc

    rng = np.random.default_rng(47)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 4, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 12 * 3600, n), unit="s"),
        "v": rng.integers(-500, 500, n).astype(np.int64),
        "tie": np.arange(n, dtype=np.int64),
    })
    out = (grouped_ohlc(_ds(df, 4), "k", "ts", "v", "tie").to_pandas()
           .sort_values(["k", "bucket"]).reset_index(drop=True))
    exp = (_ohlc_brute(df)
           .sort_values(["k", "bucket"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  exp.astype("int64"))


def test_ohlc_tie_timestamps_use_tiebreak(ray_session):
    from raqc_ray.ops.ohlc import grouped_ohlc

    ts = pd.to_datetime(["2024-01-01 00:05:00"] * 4)
    df = pd.DataFrame({"k": [1] * 4, "ts": ts,
                       "v": np.array([30, 10, 40, 20], dtype=np.int64),
                       "tie": np.array([2, 0, 3, 1], dtype=np.int64)})
    out = grouped_ohlc(_ds(df, 2), "k", "ts", "v", "tie").to_pandas()
    assert out["open"].tolist() == [10]    # tie 0
    assert out["close"].tolist() == [40]   # tie 3
    assert out["high"].tolist() == [40]
    assert out["low"].tolist() == [10]


# -------------------------------------------------- sorted neighborhood


def _sn_brute(df, window):
    s = df.sort_values(["key", "id"], kind="mergesort").reset_index(
        drop=True)
    ids = s["id"].to_numpy()
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, min(i + window + 1, len(ids))):
            rows.append([ids[i], ids[j]])
    return pd.DataFrame(rows, columns=["a_id", "b_id"])


def test_sorted_neighborhood_brute(ray_session):
    from raqc_ray.ops.neighborhood import sorted_neighborhood_pairs

    rng = np.random.default_rng(53)
    df = pd.DataFrame({"id": np.arange(400, dtype=np.int64),
                       "key": rng.integers(0, 60, 400).astype(np.int64)})
    out = (sorted_neighborhood_pairs(_ds(df, 5), ["key"], "id", 3)
           .to_pandas().sort_values(["a_id", "b_id"])
           .reset_index(drop=True))
    exp = (_sn_brute(df, 3).sort_values(["a_id", "b_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)


def test_sorted_neighborhood_thin_blocks(ray_session):
    """Window larger than some blocks: pairs must span 3+ blocks via
    the edge pass."""
    from raqc_ray.ops.neighborhood import sorted_neighborhood_pairs

    df = pd.DataFrame({"id": np.arange(9, dtype=np.int64),
                       "key": np.arange(9, dtype=np.int64)})
    out = (sorted_neighborhood_pairs(_ds(df, 8), ["key"], "id", 4)
           .to_pandas().sort_values(["a_id", "b_id"])
           .reset_index(drop=True))
    exp = (_sn_brute(df, 4).sort_values(["a_id", "b_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)


def test_sorted_neighborhood_pair_count(ray_session):
    """n rows, window w ⇒ exactly n·w − w(w+1)/2 pairs."""
    from raqc_ray.ops.neighborhood import sorted_neighborhood_pairs

    df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                       "key": np.zeros(100, dtype=np.int64)})
    got = sorted_neighborhood_pairs(_ds(df, 3), ["key"], "id", 5).count()
    assert got == 100 * 5 - 5 * 6 // 2
