"""Audio silence/clipping RUN census — run-length structure of the
waveform that the scalar features (RMS, clip fraction) cannot see:
a 2-second dropout and 2 seconds of scattered near-zeros have the
same silence FRACTION but only one of them is a broken recording.

Per item, over the channel-max absolute amplitude (exact int16
arithmetic, no floats anywhere):

- ``n_samples``             frame count
- ``sil_runs / sil_max``    maximal runs of |x| ≤ silence_thresh
                            (count, longest)
- ``clip_runs / clip_max``  maximal runs of |x| ≥ clip_thresh
- ``n_clipped``             total clipped frames

Stateful actor-pool stage (ST4 shape, `AudioFeatures` sibling):
zero-copy byte slices, the repo's own RIFF/WAV codec, vectorized
run-length extraction (one ``np.diff`` over the padded boolean mask —
no Python sample loops), per-row ``ok=false`` degradation.
Embarrassingly parallel, nothing shuffles.

Gates: closed-form planted runs (`test_ops_round4x`) and the
END-TO-END driver oracle `q204` — deterministic PCM renders with
planted dropout/clip runs pushed through the REAL encode→decode path
vs the planted closed form in SQL.

RAQC analog: none; §2 multimodal surface (audio quality gate).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from .audio import wav_decode

_SCHEMA = pa.schema([
    pa.field("item_id", pa.string()),
    pa.field("n_samples", pa.int64()),
    pa.field("sil_runs", pa.int64()),
    pa.field("sil_max", pa.int64()),
    pa.field("clip_runs", pa.int64()),
    pa.field("clip_max", pa.int64()),
    pa.field("n_clipped", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def _runs(mask: np.ndarray) -> tuple[int, int]:
    """(count, longest) of maximal True runs — one diff, no loops."""
    if not mask.any():
        return 0, 0
    m = np.zeros(len(mask) + 2, dtype=np.int8)
    m[1:-1] = mask
    d = np.diff(m)
    lens = np.flatnonzero(d == -1) - np.flatnonzero(d == 1)
    return int(len(lens)), int(lens.max())


def run_census_of(samples: np.ndarray, silence_thresh: int,
                  clip_thresh: int) -> tuple[int, ...]:
    """(n_samples, sil_runs, sil_max, clip_runs, clip_max, n_clipped)
    of one decoded (ns, ch) int16 signal — all exact ints."""
    a = np.abs(samples.astype(np.int32)).max(axis=1)
    silent = a <= silence_thresh
    clipped = a >= clip_thresh
    sr, sm = _runs(silent)
    cr, cm = _runs(clipped)
    return (int(len(a)), sr, sm, cr, cm, int(clipped.sum()))


class AudioRunStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, id_col: str = "item_id", bytes_col: str = "bytes",
                 silence_thresh: int = 8, clip_thresh: int = 32760):
        self.id_col, self.bytes_col = id_col, bytes_col
        self.silence_thresh, self.clip_thresh = silence_thresh, clip_thresh

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("n_samples", "sil_runs", "sil_max", "clip_runs",
                "clip_max", "n_clipped", "ok", "error")
        out: dict[str, list] = {k: [] for k in cols}
        out["item_id"] = ids
        for i in range(batch.num_rows):
            try:
                b = row_bytes(i)
                if b is None:
                    raise ValueError("null payload")
                s, _rate = wav_decode(b)
                row = (*run_census_of(s, self.silence_thresh,
                                      self.clip_thresh), True, None)
            except (ValueError, struct.error) as e:
                row = (0, 0, 0, 0, 0, 0, False, str(e))
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.table(out, schema=_SCHEMA)


def audio_run_census(ds, batch_size: int = 32, concurrency=2,
                     id_col: str = "item_id", bytes_col: str = "bytes",
                     silence_thresh: int = 8, clip_thresh: int = 32760):
    """(item_id, n_samples, sil_runs, sil_max, clip_runs, clip_max,
    n_clipped, ok, error) for every input row."""
    return ds.map_batches(
        AudioRunStage(id_col, bytes_col, silence_thresh, clip_thresh),
        batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow",
    )
