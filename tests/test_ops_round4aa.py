"""Round-4 session-j ops #4: conversion latency, audio spectral
census, trimmed mean, Theil, volatility — planted fixtures, degradation,
layout invariance."""

import numpy as np
import pandas as pd
import pytest


def _ds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


# ------------------------------------------------------- conversion latency

def test_funnel_latency_closed_form(ray_session):
    from raqc_ray.ops.funnel import funnel_latency

    base = pd.Timestamp("2024-01-01")
    sec = pd.Timedelta(seconds=1)
    df = pd.DataFrame({
        # u1: view@0, purchase@5 -> 5s
        # u2: purchase@0 (before first view@2), purchase@7 -> 5s
        # u3: view only -> no row ; u4: purchase only -> no row
        # u5: purchase simultaneous with view -> 0
        "u": [1, 1, 2, 2, 2, 3, 4, 5, 5],
        "ts": [base, base + 5 * sec,
               base, base + 2 * sec, base + 7 * sec,
               base, base, base + 3 * sec, base + 3 * sec],
        "et": ["view", "purchase",
               "purchase", "view", "purchase",
               "view", "purchase", "view", "purchase"],
    })
    out = (funnel_latency(_ds(df, 3), "u", "ts", "et", "view",
                          "purchase").to_pandas()
           .sort_values("u").reset_index(drop=True))
    assert out["u"].tolist() == [1, 2, 5]
    assert out["latency_us"].tolist() == [5_000_000, 5_000_000, 0]


def test_funnel_latency_layout_invariant(ray_session):
    from raqc_ray.ops.funnel import funnel_latency

    rng = np.random.default_rng(47)
    n = 3000
    df = pd.DataFrame({
        "u": rng.integers(0, 50, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10 ** 6, n), unit="s"),
        "et": rng.choice(["view", "purchase", "click"], n),
    })
    outs = [(funnel_latency(_ds(df, p), "u", "ts", "et", "view",
                            "purchase").to_pandas()
             .sort_values("u").reset_index(drop=True))
            for p in (1, 9)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------------ audio spectral

def test_spectral_pure_tone():
    from raqc_ray.ops.audiospec import spectral_features_of

    rate, n, f = 8000, 1024, 37
    t = np.arange(n)
    x = np.floor(3000.0 * np.sin(2 * np.pi * f * t / n)
                 + 0.5).astype(np.int16).reshape(-1, 1)
    ns, r, dom, dom_hz, cent, roll = spectral_features_of(x, rate)
    assert (ns, r, dom) == (n, rate, f)
    assert dom_hz == pytest.approx(f * rate / n)
    # integer-bin sine: centroid and rolloff sit at the tone (the
    # int16 floor quantization spreads ~1% of mass across the band)
    assert cent == pytest.approx(f * rate / n, rel=0.02)
    assert roll == pytest.approx(f * rate / n, rel=0.02)


def test_spectral_silence_and_dc():
    from raqc_ray.ops.audiospec import spectral_features_of

    z = np.zeros((256, 1), dtype=np.int16)
    assert spectral_features_of(z, 8000)[2:] == (0, 0.0, 0.0, 0.0)
    # constant offset = pure DC -> excluded -> all-zero features
    dc = np.full((256, 1), 1000, dtype=np.int16)
    ns, r, dom, dom_hz, cent, roll = spectral_features_of(dc, 8000)
    assert dom == 0 and cent == 0.0


def test_spectral_census_degradation(ray_session):
    import ray.data as rd
    from raqc_ray.ops.audio import wav_encode
    from raqc_ray.ops.audiospec import audio_spectral_census

    t = np.arange(512)
    good = wav_encode(np.floor(
        2000 * np.sin(2 * np.pi * 16 * t / 512) + 0.5
    ).astype(np.int16).reshape(-1, 1), 8000)
    df = pd.DataFrame({"item_id": ["a", "b"],
                       "bytes": [good, b"not a wav"]})
    out = (audio_spectral_census(rd.from_pandas(df), batch_size=2)
           .to_pandas().sort_values("item_id").reset_index(drop=True))
    assert out["ok"].tolist() == [True, False]
    assert out.loc[0, "dom_bin"] == 16
    assert out.loc[1, "error"] is not None


# ---------------------------------------------------------- trimmed mean

def test_trimmed_mean_closed_form(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_trimmed_mean

    # key 1: values 0..9, 10% trim -> drop 0 and 9 -> sum 1+..+8 = 36
    df = pd.DataFrame({"k": [1] * 10, "v": list(range(10))})
    out = grouped_trimmed_mean(_ds(df, 3), "k", "v", 1, 10).to_pandas()
    assert out["n"].iloc[0] == 10
    assert out["trimmed_n"].iloc[0] == 8
    assert out["trimmed_sum"].iloc[0] == 36
    assert out["trimmed_mean_scaled"].iloc[0] == 10**6 * 36 // 8


def test_trimmed_mean_tiny_and_tie_groups(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_trimmed_mean

    # 50% trim: n=2 -> cut=1 -> keep window empty -> dropped;
    # n=4 -> cut=2 -> also empty -> dropped: result has no rows
    df = pd.DataFrame({"k": [1, 1, 2, 2, 2, 2],
                       "v": [5, 7, 3, 3, 3, 3]})
    out = grouped_trimmed_mean(_ds(df, 2), "k", "v", 1, 2).to_pandas()
    assert len(out) == 0

    # 25% trim on n=4 all-equal values: cut=1, trimmed sum 2*3
    df2 = pd.DataFrame({"k": [2] * 4, "v": [3, 3, 3, 3]})
    out2 = grouped_trimmed_mean(_ds(df2, 2), "k", "v", 1,
                                4).to_pandas()
    assert out2["trimmed_n"].tolist() == [2]
    assert out2["trimmed_sum"].tolist() == [6]


def test_trimmed_mean_vs_pandas(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_trimmed_mean

    rng = np.random.default_rng(53)
    df = pd.DataFrame({"k": rng.integers(0, 40, 6000),
                       "v": rng.integers(-500, 500, 6000)})
    out = (grouped_trimmed_mean(_ds(df, 8), "k", "v", 1, 10)
           .to_pandas().sort_values("k").reset_index(drop=True))

    def ref(g):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        cut = n // 10
        kept = v[cut:n - cut]
        return int(kept.sum())

    exp = df.groupby("k").apply(ref, include_groups=False)
    assert out["trimmed_sum"].tolist() == exp.tolist()


# ----------------------------------------------------------------- theil

def test_theil_closed_forms(ray_session):
    from raqc_ray.ops.inequality import grouped_theil

    # equal values -> theil 0; one-holds-all (approx) -> near ln(n)
    df = pd.DataFrame({
        "k": ["eq"] * 4 + ["con"] * 4,
        "v": [5, 5, 5, 5, 1, 1, 1, 10**6],
    })
    out = (grouped_theil(_ds(df, 2), "k", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    con, eq = out.iloc[0], out.iloc[1]
    assert eq["theil"] == 0.0
    assert con["theil"] == pytest.approx(np.log(4), rel=0.01)
    # zero/negative values are filtered (domain contract)
    df2 = pd.DataFrame({"k": ["a"] * 3, "v": [0, -5, 7]})
    out2 = grouped_theil(_ds(df2, 2), "k", "v").to_pandas()
    assert out2["n"].iloc[0] == 1 and out2["theil"].iloc[0] == 0.0


def test_theil_layout_invariant(ray_session):
    from raqc_ray.ops.inequality import grouped_theil

    rng = np.random.default_rng(59)
    df = pd.DataFrame({"k": rng.integers(0, 15, 4000),
                       "v": rng.integers(1, 1000, 4000)})
    outs = [(grouped_theil(_ds(df, p), "k", "v").to_pandas()
             .sort_values("k").reset_index(drop=True))
            for p in (1, 7)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------------------- volatility

def test_abs_jump_closed_form(ray_session):
    from raqc_ray.ops.lagprod import grouped_abs_jump_stats

    # key 1: cents 100,300,200 -> jumps 200,100 -> sum 300 max 200
    df = pd.DataFrame({"k": [1, 1, 1, 2],
                       "t": [1, 2, 3, 1],
                       "id": [1, 2, 3, 4],
                       "val": [1.0, 3.0, 2.0, 9.0]})
    out = grouped_abs_jump_stats(_ds(df, 2), "k", "t", "id",
                                 "val").to_pandas()
    assert out["k"].tolist() == [1]       # singleton key 2 dropped
    assert out["n_pairs"].iloc[0] == 2
    assert out["sum_abs_jump"].iloc[0] == 300
    assert out["max_abs_jump"].iloc[0] == 200


def test_abs_jump_layout_and_skew(ray_session):
    from raqc_ray.ops.lagprod import grouped_abs_jump_stats

    rng = np.random.default_rng(61)
    n = 5000
    k = np.where(rng.random(n) < 0.6, 1, rng.integers(2, 30, n))
    df = pd.DataFrame({"k": k, "t": rng.integers(0, 10 ** 7, n),
                       "id": np.arange(n),
                       "val": rng.random(n) * 40})
    outs = [(grouped_abs_jump_stats(_ds(df, p), "k", "t", "id", "val")
             .to_pandas().sort_values("k").reset_index(drop=True))
            for p in (1, 10)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    s = df[df["k"] == 1].sort_values(["t", "id"])
    vi = np.floor(s["val"].to_numpy() * 100 + 0.5).astype(np.int64)
    j = np.abs(np.diff(vi))
    row = outs[0][outs[0]["k"] == 1].iloc[0]
    assert row["sum_abs_jump"] == j.sum()
    assert row["max_abs_jump"] == j.max()
