"""RVID scene-cut census — sequential frame-delta detection over the
engine's video container (ops/multimodal RVID: independently-coded
frames behind a seekable length index).  The temporal sibling of the
cross-epoch tile diff: instead of "where did the repeat image move",
this answers "where does the footage CUT" — the shot-boundary signal
a video ingest pipeline needs before sampling representative frames.

Per video, every frame is decoded IN ORDER (a cut detector is the one
pass that genuinely needs consecutive frames — contrast
`RvidFrameSampler`, which seeks only k of them) and reduced to exact
mean-luma cents ``floor(mean(luma)*100 + 0.5)``; consecutive-frame
jumps ``|mc[i+1] - mc[i]|`` are censused:

- ``n_frames``  frames in the container
- ``n_cuts``    jumps strictly above ``thr_c`` cents
- ``n_frozen``  zero jumps — consecutive frames with IDENTICAL mean
                luma (the frozen-frame / stuck-encoder signal)
- ``max_jump``  largest jump (0 for single-frame videos)

All int64-exact; a video whose ANY frame fails to decode degrades to
``ok=false`` (a cut census with holes is not a census).

Scale shape: embarrassingly parallel per video, no shuffle; payload-
heavy rows → small ``batch_size``, actor pool owns the decode loop.

Gates: planted unit tests (`test_scenecut`) and the end-to-end driver
oracle `q180_scenecut_documents` — uniform-gray frame sequences whose
jumps have a modular closed form in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import binary_row_accessor
from ..codecs import DecodeError, decode_image
from .exposure import luma_cents
from .multimodal import rvid_index, sniff_image_format

_SCHEMA = pa.schema([
    pa.field("item_id", pa.string()),
    pa.field("n_frames", pa.int64()),
    pa.field("n_cuts", pa.int64()),
    pa.field("n_frozen", pa.int64()),
    pa.field("max_jump", pa.int64()),
    pa.field("ok", pa.bool_()),
    pa.field("error", pa.string()),
])


def frame_mean_cents(frame_bytes: bytes) -> int:
    """Exact mean-luma cents of one coded frame: floor of the mean of
    the exact per-pixel cents grid, +0.5-rounded — for a uniform gray
    frame of value v this is exactly 100*v."""
    arr = decode_image(frame_bytes, sniff_image_format(frame_bytes))
    c = luma_cents(arr)
    # exact rational mean -> cents: floor((sum*2 + n) / (2*n))
    return int((2 * int(c.sum()) + c.size) // (2 * c.size))


def scene_cuts_of(data: bytes, thr_c: int) -> tuple[int, int, int, int]:
    """(n_frames, n_cuts, n_frozen, max_jump) of one RVID payload;
    raises DecodeError on container or frame damage."""
    idx = rvid_index(data)
    if not idx:
        raise DecodeError("rvid: zero frames")
    mcs = np.empty(len(idx), dtype=np.int64)
    for j, (off, ln) in enumerate(idx):
        mcs[j] = frame_mean_cents(data[off:off + ln])
    if len(mcs) < 2:
        return (len(mcs), 0, 0, 0)
    jumps = np.abs(np.diff(mcs))
    return (len(mcs), int((jumps > thr_c).sum()),
            int((jumps == 0).sum()), int(jumps.max()))


class SceneCutStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, bytes_col: str = "bytes",
                 id_col: str = "item_id", thr_c: int = 500):
        self.bytes_col, self.id_col = bytes_col, id_col
        self.thr_c = int(thr_c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        row_bytes = binary_row_accessor(batch[self.bytes_col])
        cols = ("n_frames", "n_cuts", "n_frozen", "max_jump", "ok",
                "error")
        out: dict[str, list] = {k: [] for k in cols}
        for i in range(len(ids)):
            try:
                row = (*scene_cuts_of(bytes(row_bytes(i)), self.thr_c),
                       True, None)
            except (DecodeError, TypeError, ValueError) as e:
                row = (0, 0, 0, 0, False,
                       f"{type(e).__name__}: {e}")
            for k, v in zip(cols, row):
                out[k].append(v)
        return pa.Table.from_pydict(
            {"item_id": ids, **out}, schema=_SCHEMA)


def scene_cuts(ds, bytes_col: str = "bytes", id_col: str = "item_id",
               thr_c: int = 500, concurrency: int | None = None,
               batch_size: int = 32):
    """Dataset of ``_SCHEMA`` rows — one cut census per video."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        SceneCutStage(bytes_col=bytes_col, id_col=id_col, thr_c=thr_c),
        **kwargs)
