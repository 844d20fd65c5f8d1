"""Gates for the JPEG quality forensics stage (ops/jpegquality):
quality→DQT injectivity, exact roundtrip recovery across the sweep,
foreign-table and damage handling."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raqc_ray.jpeg import _QC, _QY, ZIGZAG, _quality_scale, encode_jpeg
from raqc_ray.ops.jpegquality import (JpegQualityStage, jpeg_quality,
                                      walk_dqt, _candidates)


def _img(seed=3, h=16, w=16):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_quality_to_dqt_is_injective():
    # the recovery contract: the LUMA table never collides; the
    # chroma table saturates to all-255 only for q <= 3, which the
    # luma-driven recovery disambiguates
    def tables(base):
        return [bytes(int(_quality_scale(base, q)[z]) for z in ZIGZAG)
                for q in range(1, 101)]

    assert len(set(tables(_QY))) == 100
    qc = tables(_QC)
    collided = {q for q in range(1, 101)
                if qc.count(qc[q - 1]) > 1}
    assert collided == {1, 2, 3}
    assert qc[0] == b"\xff" * 64


def test_roundtrip_recovers_every_quality():
    stage = JpegQualityStage()
    arr = _img()
    for q in [2, 3] + list(range(1, 101, 7)):
        tabs = walk_dqt(encode_jpeg(arr, quality=q))
        assert len(tabs) == 2
        assert stage._recover(tabs) == q


def test_foreign_table_reports_minus_one():
    data = bytearray(encode_jpeg(_img(), quality=80))
    # perturb one DQT byte (first table value after marker+len+id),
    # keeping the container valid
    i = data.index(b"\xFF\xDB") + 5
    data[i] = (data[i] + 1) % 256 or 1
    tabs = walk_dqt(bytes(data))
    stage = JpegQualityStage()
    assert stage._recover(tabs) == -1


def test_walk_rejects_damage():
    good = encode_jpeg(_img(), quality=80)
    with pytest.raises(ValueError):
        walk_dqt(b"\x00\x01" + good[2:])
    with pytest.raises(ValueError):
        walk_dqt(good[:40])  # truncated before SOS


def test_stage_roundtrip():
    rows = [{"image_id": str(q), "bytes": encode_jpeg(_img(q), q)}
            for q in (35, 60, 92)]
    rows.append({"image_id": "rot", "bytes": b"JUNK"})
    df = (jpeg_quality(rd.from_pandas(pd.DataFrame(rows)))
          .to_pandas().set_index("image_id"))
    for q in (35, 60, 92):
        assert int(df.loc[str(q), "q_est"]) == q
        assert int(df.loc[str(q), "n_dqt"]) == 2
    assert not bool(df.loc["rot", "ok"])
