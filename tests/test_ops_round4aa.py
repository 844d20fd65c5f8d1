"""Round-4 session-j ops #4: benchmark decontamination, conversion
latency, audio spectral census — planted fixtures, degradation,
layout invariance."""

import numpy as np
import pandas as pd
import pytest


def _ds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


# -------------------------------------------------------- decontamination

def test_contamination_planted(ray_session):
    from raqc_ray.ops.decontam import contamination_census

    # doc 0 is the benchmark (0 % 5 == 0); doc 7 copies one of its
    # 3-gram spans, doc 8 shares nothing, doc 9 copies the whole text
    docs = pd.DataFrame({
        "doc_id": [0, 7, 8, 9],
        "text": ["alpha beta gamma delta",
                 "x y alpha beta gamma z",
                 "p q r s t",
                 "alpha beta gamma delta"],
    })
    out = (contamination_census(_ds(docs, 2), bench_mod=5, k=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [7, 9]
    # doc 7: shingles {xy a, y a b, a b g, b g z} -> 1 overlap of 4
    assert out.loc[0, "n_shingles"] == 4
    assert out.loc[0, "n_overlap"] == 1
    # doc 9: identical text -> both shingles overlap
    assert out.loc[1, "n_shingles"] == 2
    assert out.loc[1, "n_overlap"] == 2


def test_contamination_short_docs_and_empty_bench(ray_session):
    from raqc_ray.ops.decontam import contamination_census

    # benchmark doc is SHORT (2 tokens -> whole-list shingle);
    # doc 3 repeats it exactly, doc 4 contains it only as a prefix
    # (different whole-list shingle -> no match)
    docs = pd.DataFrame({
        "doc_id": [0, 3, 4],
        "text": ["hello world", "hello world", "hello world again"],
    })
    out = (contamination_census(_ds(docs, 2), bench_mod=5, k=3)
           .to_pandas())
    assert out["doc_id"].tolist() == [3]
    assert out["n_overlap"].tolist() == [1]

    # empty benchmark -> nothing flagged
    docs2 = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b c"]})
    out2 = contamination_census(_ds(docs2, 2), bench_mod=5,
                                k=3).to_pandas()
    assert len(out2) == 0


def test_contamination_layout_invariant(ray_session):
    from raqc_ray.ops.decontam import contamination_census

    rng = np.random.default_rng(43)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts = [" ".join(rng.choice(vocab, size=8)) for _ in range(400)]
    docs = pd.DataFrame({"doc_id": np.arange(400), "text": texts})
    outs = [(contamination_census(_ds(docs, p), bench_mod=7, k=3)
             .to_pandas().sort_values("doc_id")
             .reset_index(drop=True)) for p in (1, 8)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) > 0  # dense vocab guarantees collisions


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
