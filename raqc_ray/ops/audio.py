"""Audio column plumbing — real RIFF/WAV PCM codec + feature extraction
as an actor-pool ``map_batches`` stage (the audio leg of the multimodal
surface; images decode via :mod:`raqc_ray.codecs`, video frame-sampling
is :class:`raqc_ray.ops.multimodal.VideoFrameSampler`).

No audio library exists in this environment and none is needed: WAV
(RIFF little-endian, 16-bit PCM — the public Microsoft/IBM container
format) is a chunked header over raw samples.  Decode is
``np.frombuffer`` over the Arrow buffer slice — a zero-copy int16 VIEW,
so a batch of audio rows never duplicates its payload bytes; every
feature below is a numpy reduction over that view.

Scale notes (100-TB audio table):

- the stage is a callable CLASS → actor pool; batch_size must be sized
  for fat binary rows (§ "Memory-aware" — 1 min of 16 kHz mono PCM is
  ~1.9 MB, so batch_size 32 × concurrency 8 ≈ 0.5 GB in flight);
- output rows are narrow fixed-width features — the fat bytes column
  never passes the stage, so everything downstream (dedup on feature
  vectors, drift on RMS distributions) shuffles cheaply;
- undecodable rows emit ``ok=False`` + error instead of raising — one
  corrupt object must not kill a 10^12-row job.

RAQC analog: none (the reference is raster-only); part of the §2
"multimodal columns" surface of the task brief.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor

_PCM_FMT = 1


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """float [-1, 1] (or int16) mono ``(n,)`` / multi-channel ``(n, ch)``
    → RIFF/WAV 16-bit PCM bytes.  Values outside [-1, 1] clip (as any
    fixed-point encoder does)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    ch = a.shape[1]
    if a.dtype != np.int16:
        a = np.clip(np.asarray(a, dtype=np.float64), -1.0, 1.0)
        a = np.round(a * 32767.0).astype("<i2")
    else:
        a = a.astype("<i2", copy=False)
    data = a.reshape(-1).tobytes()  # interleaved frames
    block_align = 2 * ch
    fmt = struct.pack("<HHIIHH", _PCM_FMT, ch, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def wav_decode(data) -> tuple[np.ndarray, int]:
    """RIFF/WAV bytes (or memoryview — stays zero-copy) → ``(samples,
    sample_rate)`` with samples an int16 VIEW shaped ``(n, ch)``.
    Raises ``ValueError`` on anything that is not 16-bit PCM."""
    mv = memoryview(data)
    if len(mv) < 12 or bytes(mv[0:4]) != b"RIFF" or bytes(mv[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, len(mv)
    ch = rate = None
    samples = None
    while pos + 8 <= end:
        cid = bytes(mv[pos:pos + 4])
        (size,) = struct.unpack("<I", mv[pos + 4:pos + 8])
        body = mv[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            afmt, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if afmt != _PCM_FMT or bits != 16:
                raise ValueError(f"unsupported wav (fmt={afmt}, bits={bits})")
        elif cid == b"data":
            if ch is None:
                raise ValueError("data chunk before fmt chunk")
            n = size // (2 * ch)
            samples = np.frombuffer(body, dtype="<i2",
                                    count=n * ch).reshape(n, ch)
            break
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if samples is None:
        raise ValueError("no data chunk")
    return samples, int(rate)


AUDIO_FEATURE_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("ok", pa.bool_()),
        ("error", pa.string()),
        ("n_samples", pa.int64()),
        ("sample_rate", pa.int64()),
        ("n_channels", pa.int32()),
        ("duration_sec", pa.float64()),
        ("rms", pa.float64()),
        ("peak", pa.float64()),
        ("zcr_hz", pa.float64()),
        ("clip_frac", pa.float64()),
        ("rms_w_max", pa.float64()),
    ]
)


class AudioFeatures:
    """Actor-pool stage: WAV bytes → per-row audio quality features.

    Features (all on samples normalized to [-1, 1]): duration, RMS,
    peak, zero-crossing rate in Hz (channel-mean), clipping fraction
    (|x| ≥ clip_thresh), and the max RMS over ``window_ms`` windows
    (the envelope statistic a silence/clipping quality gate needs).
    """

    def __init__(self, id_col: str = "item_id", bytes_col: str = "bytes",
                 window_ms: int = 100, clip_thresh: float = 0.999):
        self.id_col, self.bytes_col = id_col, bytes_col
        self.window_ms, self.clip_thresh = window_ms, clip_thresh

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        n = batch.num_rows
        out = {name: [] for name in AUDIO_FEATURE_SCHEMA.names}
        for i in range(n):
            out["item_id"].append(ids[i])
            b = row_bytes(i)
            try:
                if b is None:
                    raise ValueError("null payload")
                s, rate = wav_decode(b)
                x = s.astype(np.float64) / 32768.0
                ns, ch = s.shape
                rms = float(np.sqrt(np.mean(x * x))) if ns else 0.0
                peak = float(np.abs(x).max()) if ns else 0.0
                if ns > 1:
                    crossings = np.count_nonzero(
                        np.signbit(x[1:]) != np.signbit(x[:-1])
                    ) / ch
                    zcr = crossings * rate / (ns - 1)
                else:
                    zcr = 0.0
                clip = (float(np.mean(np.abs(x) >= self.clip_thresh))
                        if ns else 0.0)
                w = max(1, rate * self.window_ms // 1000)
                nw = ns // w
                if nw >= 1:
                    e = x[: nw * w].reshape(nw, w, ch)
                    rms_w = np.sqrt((e * e).mean(axis=(1, 2)))
                    rms_w_max = float(rms_w.max())
                else:
                    rms_w_max = rms
                out["ok"].append(True)
                out["error"].append(None)
                out["n_samples"].append(ns)
                out["sample_rate"].append(rate)
                out["n_channels"].append(ch)
                out["duration_sec"].append(ns / rate)
                out["rms"].append(rms)
                out["peak"].append(peak)
                out["zcr_hz"].append(zcr)
                out["clip_frac"].append(clip)
                out["rms_w_max"].append(rms_w_max)
            except (ValueError, struct.error) as exc:
                out["ok"].append(False)
                out["error"].append(str(exc))
                for k in ("n_samples", "sample_rate", "n_channels",
                          "duration_sec", "rms", "peak", "zcr_hz",
                          "clip_frac", "rms_w_max"):
                    out[k].append(None)
        return pa.table(out, schema=AUDIO_FEATURE_SCHEMA)


def extract_audio_features(ds, batch_size: int = 32, concurrency=2,
                           id_col: str = "item_id",
                           bytes_col: str = "bytes"):
    """audio table → AUDIO_FEATURE_SCHEMA Dataset (actor pool — the
    CLASS goes to map_batches so setup happens once per actor; fat
    binary rows in, narrow feature rows out, the bytes column does not
    survive the stage)."""
    return ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "bytes_col": bytes_col},
    )
