"""WAV codec + audio feature stage (ops/audio.py): closed-form checks
on planted sines, stereo, clipping, corrupt payloads, and the
distributed actor-pool path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raqc_ray.ops.audio import (
    AudioFeatures,
    extract_audio_features,
    wav_decode,
    wav_encode,
)


def _sine(freq, sr, sec, amp=0.5):
    t = np.arange(int(sr * sec)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def test_wav_roundtrip_mono_and_stereo():
    x = _sine(440, 8000, 0.5)
    s, r = wav_decode(wav_encode(x, 8000))
    assert r == 8000 and s.shape == (4000, 1)
    np.testing.assert_allclose(s[:, 0] / 32768.0, x, atol=1.0 / 32767)

    st = np.stack([x, _sine(100, 8000, 0.5, amp=0.25)], axis=1)
    s2, r2 = wav_decode(wav_encode(st, 8000))
    assert s2.shape == (4000, 2)
    np.testing.assert_allclose(s2 / 32768.0, st, atol=1.0 / 32767)


def test_wav_decode_rejects_garbage():
    for bad in (b"", b"RIFFxxxxNOPE", b"garbage",
                wav_encode(_sine(440, 8000, 0.1), 8000)[:30]):
        with pytest.raises(ValueError):
            wav_decode(bad)


def test_features_closed_form():
    sr = 8000
    rows = {
        "item_id": ["sine", "clipped", "silent"],
        "bytes": [
            wav_encode(_sine(440, sr, 1.0, amp=0.5), sr),
            # amplitude 1.2 sine clips; clipped fraction of a sine at
            # threshold c/a is 1 - (2/pi)*arcsin(c/a)
            wav_encode(_sine(440, sr, 1.0, amp=1.2), sr),
            wav_encode(np.zeros(sr), sr),
        ],
    }
    out = AudioFeatures()(pa.table(rows)).to_pandas().set_index("item_id")
    assert out["ok"].all()
    s = out.loc["sine"]
    assert s["duration_sec"] == 1.0 and s["sample_rate"] == sr
    np.testing.assert_allclose(s["rms"], 0.5 / np.sqrt(2), rtol=1e-3)
    np.testing.assert_allclose(s["zcr_hz"], 2 * 440, rtol=2e-2)
    assert s["clip_frac"] == 0.0
    c = out.loc["clipped"]
    want_clip = 1 - (2 / np.pi) * np.arcsin(0.999 / 1.2)
    np.testing.assert_allclose(c["clip_frac"], want_clip, rtol=5e-2)
    np.testing.assert_allclose(c["peak"], 32767 / 32768.0)
    q = out.loc["silent"]
    assert q["rms"] == 0.0 and q["zcr_hz"] == 0.0 and q["rms_w_max"] == 0.0


def test_features_envelope_and_errors():
    sr = 8000
    # 0.5 s silence then 0.5 s tone: whole-clip RMS is tone_rms/sqrt(2),
    # but the 100 ms window max recovers the tone-only RMS
    x = np.concatenate([np.zeros(4000), _sine(440, sr, 0.5, amp=0.5)])
    rows = {"item_id": ["env", "null", "bad"],
            "bytes": [wav_encode(x, sr), None, b"XXXX"]}
    out = AudioFeatures()(pa.table(
        rows, schema=pa.schema([("item_id", pa.string()),
                                ("bytes", pa.binary())])
    )).to_pandas().set_index("item_id")
    e = out.loc["env"]
    np.testing.assert_allclose(e["rms_w_max"], 0.5 / np.sqrt(2), rtol=1e-2)
    np.testing.assert_allclose(e["rms"], 0.5 / 2.0, rtol=1e-2)
    assert not out.loc["null"]["ok"] and not out.loc["bad"]["ok"]
    assert "payload" in out.loc["null"]["error"]


def test_extract_audio_features_distributed(ray_session):
    import ray.data as rd

    sr = 8000
    df = pd.DataFrame(
        {
            "item_id": [f"a{i}" for i in range(40)],
            "bytes": [
                wav_encode(_sine(100 + 10 * i, sr, 0.25, amp=0.4), sr)
                for i in range(40)
            ],
        }
    )
    out = (
        extract_audio_features(rd.from_pandas(df).repartition(4),
                               batch_size=8, concurrency=2)
        .to_pandas()
        .sort_values("item_id")
    )
    assert len(out) == 40 and out["ok"].all()
    assert (out["n_samples"] == 2000).all()
    assert (out["duration_sec"] == 0.25).all()
    np.testing.assert_allclose(out["rms"], 0.4 / np.sqrt(2), rtol=1e-2)
    # the fat bytes column must not survive the stage
    assert "bytes" not in out.columns
