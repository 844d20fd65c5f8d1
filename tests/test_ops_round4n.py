"""Gates for the PNG structural audit stage (ops/pngaudit): planted
CRC corruption, framing damage, truncation, and the clean path —
through the REAL encoder's byte stream."""

import numpy as np
import pandas as pd
import ray.data as rd

from raqc_ray.codecs import encode_png
from raqc_ray.ops.pngaudit import png_audit, png_audit_of


def _png(w=8, h=6, v=50):
    return encode_png(np.full((h, w, 3), v, dtype=np.uint8))


def test_audit_clean_closed_form():
    data = _png(w=11, h=7)
    w, h, bd, ct, nc, idat, fail = png_audit_of(data)
    assert (w, h, bd, ct, nc, fail) == (11, 7, 8, 2, 3, 0)
    # layout: sig(8) + IHDR(25) + IDAT(8+idat+4) + IEND(12)
    assert len(data) == 8 + 25 + 8 + idat + 4 + 12


def test_audit_counts_crc_corruption_without_failing():
    data = bytearray(_png())
    data[-13] ^= 0x5A  # last byte of the IDAT CRC
    w, h, bd, ct, nc, idat, fail = png_audit_of(bytes(data))
    assert fail == 1 and nc == 3
    data[29] ^= 0xFF  # IHDR CRC too (bytes 29..32)
    assert png_audit_of(bytes(data))[6] == 2


def test_audit_rejects_structural_damage():
    import pytest
    good = _png()
    with pytest.raises(ValueError):
        png_audit_of(b"GIF89a" + good[6:])  # bad signature
    with pytest.raises(ValueError):
        png_audit_of(good[:20])  # truncated mid-IHDR
    bad = bytearray(good)
    bad[8:12] = (2 ** 30).to_bytes(4, "big")  # IHDR length overrun
    with pytest.raises(ValueError):
        png_audit_of(bytes(bad))
    with pytest.raises(ValueError):
        png_audit_of(good[:-12])  # IEND sliced off


def test_audit_stage_mixed_batch():
    corrupt = bytearray(_png(w=9, h=9))
    corrupt[-13] ^= 0x5A
    ds = rd.from_pandas(pd.DataFrame([
        {"image_id": "good", "bytes": _png(w=5, h=4)},
        {"image_id": "rot", "bytes": bytes(corrupt)},
        {"image_id": "junk", "bytes": b"\x00" * 30},
    ]))
    df = png_audit(ds, batch_size=2).to_pandas().set_index("image_id")
    assert bool(df.loc["good", "ok"]) and int(df.loc["good", "crc_fail"]) == 0
    assert (int(df.loc["good", "w"]), int(df.loc["good", "h"])) == (5, 4)
    assert bool(df.loc["rot", "ok"]) and int(df.loc["rot", "crc_fail"]) == 1
    assert not bool(df.loc["junk", "ok"])
