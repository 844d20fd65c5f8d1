"""Gates for the quarantine composition (ops/quarantine): broadcast
vs anti-join path equivalence, empty condemned set passthrough, and
the triage → decode two-tier wiring."""

import numpy as np
import pandas as pd
import ray.data as rd

from raqc_ray.codecs import encode_png
from raqc_ray.ops.pngaudit import png_audit
from raqc_ray.ops.quarantine import drop_quarantined


def _corpus():
    rows = []
    for d in range(12):
        data = bytearray(encode_png(
            np.full((6, 8, 3), 30 + d, dtype=np.uint8)))
        if d % 4 == 0:
            data[-13] ^= 0x5A  # rot the IDAT CRC
        rows.append({"image_id": str(d), "bytes": bytes(data),
                     "fmt": "png"})
    return pd.DataFrame(rows)


def _bad_ids(imgs):
    def condemned(df: pd.DataFrame) -> pd.DataFrame:
        return df[(~df["ok"]) | (df["crc_fail"] > 0)][["image_id"]]
    return png_audit(imgs).map_batches(condemned, batch_format="pandas")


def test_quarantine_paths_equivalent():
    imgs = rd.from_pandas(_corpus())
    bad = _bad_ids(imgs)
    keep_bc = sorted(drop_quarantined(imgs, bad)
                     .to_pandas()["image_id"])
    keep_aj = sorted(drop_quarantined(imgs, _bad_ids(imgs),
                                      broadcast_limit=0,
                                      num_partitions=4)
                     .to_pandas()["image_id"])
    expect = sorted(str(d) for d in range(12) if d % 4 != 0)
    assert keep_bc == expect
    assert keep_aj == expect


def test_quarantine_empty_bad_set_is_passthrough():
    df = _corpus()
    clean = df[df["image_id"].astype(int) % 4 != 0].reset_index(
        drop=True)
    imgs = rd.from_pandas(clean)
    out = drop_quarantined(imgs, _bad_ids(imgs)).to_pandas()
    assert sorted(out["image_id"]) == sorted(clean["image_id"])
