"""Audio SPECTRAL census — frequency-domain features over raw PCM via
the real FFT (numpy ``rfft``): dominant-frequency bin, spectral
centroid and 85% rolloff per clip.  The frequency-structure screen
the time-domain features (`ops/audio` RMS/clip, `ops/audiorun` run
lengths) cannot see: a 50/60 Hz hum, a constant test tone, or a
band-limited re-encode all look normal in amplitude space and jump
out in the spectrum.

Actor-pool ST4 stage over the repo's own RIFF/WAV codec (channel-mean
mono, magnitude spectrum with the DC bin excluded so silence/offset
doesn't dominate); ``ok=false`` degradation on undecodable rows.
``dom_bin`` is an EXACT int64 (argmax of the magnitude spectrum,
smallest bin on ties); the float features are rounded to 6dp.  No SQL
oracle (FFT is not DuckDB-expressible) — gated by closed-form
pure-tone fixtures (a sine at bin f has ``dom_bin == f`` and centroid
→ f·rate/n) and junk-row degradation, the q16-q19 no-oracle pattern.

RAQC analog: none (SURVEY §2 multimodal surface — the audio analog of
the image frequency censuses q195 banding / q197 gradients).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from .audio import wav_decode

_SCHEMA = pa.schema([
    ("item_id", pa.string()),
    ("n_samples", pa.int64()),
    ("rate", pa.int64()),
    ("dom_bin", pa.int64()),
    ("dom_hz", pa.float64()),
    ("centroid_hz", pa.float64()),
    ("rolloff_hz", pa.float64()),
    ("ok", pa.bool_()),
    ("error", pa.string()),
])


def spectral_features_of(s: np.ndarray, rate: int,
                         rolloff: float = 0.85) -> tuple:
    """(n_samples, rate, dom_bin, dom_hz, centroid_hz, rolloff_hz)
    of an (n, channels) int16 array — channel-mean mono, rfft
    magnitudes, DC bin excluded."""
    x = s.astype(np.float64).mean(axis=1) if s.ndim == 2 else \
        s.astype(np.float64)
    n = len(x)
    if n < 2:
        return (n, rate, 0, 0.0, 0.0, 0.0)
    mag = np.abs(np.fft.rfft(x))
    mag[0] = 0.0                      # drop DC: offset is not a tone
    tot = float(mag.sum())
    if tot <= 0.0:
        return (n, rate, 0, 0.0, 0.0, 0.0)
    dom = int(np.argmax(mag))         # first max on ties
    freqs = np.arange(len(mag), dtype=np.float64) * (rate / n)
    centroid = float((mag * freqs).sum() / tot)
    cum = np.cumsum(mag)
    roll = int(np.searchsorted(cum, rolloff * tot))
    return (n, rate, dom, round(dom * rate / n, 6),
            round(centroid, 6), round(freqs[min(roll, len(mag) - 1)], 6))


class AudioSpectralStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, id_col: str = "item_id",
                 bytes_col: str = "bytes", rolloff: float = 0.85):
        self.id_col, self.bytes_col = id_col, bytes_col
        self.rolloff = rolloff

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("n_samples", "rate", "dom_bin", "dom_hz",
                "centroid_hz", "rolloff_hz", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        out["item_id"] = ids
        for i in range(batch.num_rows):
            try:
                b = row_bytes(i)
                if b is None:
                    raise ValueError("null payload")
                s, rate = wav_decode(b)
                row = (*spectral_features_of(s, rate, self.rolloff),
                       True, None)
            except (ValueError, struct.error) as e:
                row = (0, 0, 0, 0.0, 0.0, 0.0, False, str(e))
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.table(out, schema=_SCHEMA)


def audio_spectral_census(ds, batch_size: int = 32, concurrency=2,
                          id_col: str = "item_id",
                          bytes_col: str = "bytes",
                          rolloff: float = 0.85):
    """(item_id, n_samples, rate, dom_bin, dom_hz, centroid_hz,
    rolloff_hz, ok, error) for every input row."""
    return ds.map_batches(
        AudioSpectralStage(id_col, bytes_col, rolloff),
        batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow",
    )
