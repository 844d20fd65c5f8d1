"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

The Ray-side plumbing (schemas, actor-pool stage shapes, batch sizing,
output layout) is real and tested; the codec bodies for formats whose
libraries are absent in this container (JPEG, audio, video) are stubbed
behind clearly-marked seams:

- images: ``ppm``/``png``/``jpeg`` decode fully (raqc_ray.codecs; jpeg
  via PIL when importable, else the vendored pure-python baseline
  decoder in raqc_ray.jpeg).
- audio/video: ``DeterministicFakeDecoder`` produces a seeded fake feature
  vector from the payload hash so the pipeline shape is exercisable end to
  end; swap in a real decoder by replacing one method.

Batch-size note (scale): payload rows are fat — callers should pass
``batch_size`` small enough that batch × concurrency fits worker heaps
(the guide's memory rule).  Feature outputs are narrow; nothing fat ever
re-enters a shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..codecs import DecodeError, decode_image

FEATURE_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("modality", pa.string()),
        ("ok", pa.bool_()),
        ("error", pa.string()),
        ("feature", pa.list_(pa.float32())),
        ("meta_json", pa.string()),
    ]
)


class ImageFeatureExtractor:
    """Actor-pool stage: decode + resize-to-grid feature (8×8 luma means).

    Real decode for ppm/png/jpeg (codecs.decode_image).
    """

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id", grid: int = 8):
        self.bytes_col, self.fmt_col, self.id_col = bytes_col, fmt_col, id_col
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        bts = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out = {k: [] for k in FEATURE_SCHEMA.names}
        g = self.grid
        for i, (iid, b, fmt) in enumerate(zip(ids, bts, fmts)):
            out["item_id"].append(iid)
            out["modality"].append("image")
            try:
                img = decode_image(b, fmt)
            except DecodeError as e:
                out["ok"].append(False)
                out["error"].append(str(e))
                out["feature"].append(None)
                out["meta_json"].append("{}")
                continue
            luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                    + 0.114 * img[:, :, 2])
            h, w = luma.shape
            ys = (np.arange(g + 1) * h) // g
            xs = (np.arange(g + 1) * w) // g
            if h >= g and w >= g:
                rs = np.add.reduceat(luma, ys[:g], axis=0)
                grid = np.add.reduceat(rs, xs[:g], axis=1)
                grid /= np.outer(np.diff(ys), np.diff(xs))
            else:
                grid = np.full((g, g), float(luma.mean()))
            out["ok"].append(True)
            out["error"].append(None)
            out["feature"].append(grid.ravel().astype(np.float32))
            out["meta_json"].append(json.dumps({"w": w, "h": h, "fmt": fmt}))
        return pa.table(out, schema=FEATURE_SCHEMA)


class DeterministicFakeDecoder:
    """STUB decoder for modalities whose codecs are absent here (audio
    frames, video frame-samples).  Produces a seeded feature from the
    payload digest — deterministic, collision-resistant, zero codec deps.
    Replace ``_decode`` with a real librosa/pyav call where available."""

    def __init__(self, modality: str, id_col: str, bytes_col: str = "bytes",
                 dim: int = 32):
        self.modality, self.id_col, self.bytes_col, self.dim = (
            modality, id_col, bytes_col, dim)

    def _decode(self, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(digest, "little"))
        return rng.normal(size=self.dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.string()).to_pylist()
        bts = batch[self.bytes_col].to_pylist()
        out = {k: [] for k in FEATURE_SCHEMA.names}
        for iid, b in zip(ids, bts):
            out["item_id"].append(iid)
            out["modality"].append(self.modality)
            if b is None:
                out["ok"].append(False)
                out["error"].append("null payload")
                out["feature"].append(None)
                out["meta_json"].append("{}")
            else:
                out["ok"].append(True)
                out["error"].append(None)
                out["feature"].append(self._decode(bytes(b)))
                out["meta_json"].append("{}")
        return pa.table(out, schema=FEATURE_SCHEMA)


def extract_image_features(ds, batch_size: int = 128, concurrency=2):
    """images table → FEATURE_SCHEMA Dataset (actor pool; fat rows in,
    narrow features out)."""
    return ds.map_batches(
        ImageFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
