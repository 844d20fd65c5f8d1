import os

import numpy as np
import pyarrow.parquet as pq

from raqc_ray.fixtures import PLAN, expected_violation_keys
from raqc_ray.schema import IMAGES_SCHEMA


def test_t1_layout(t1_fixture):
    root = t1_fixture["root"]
    assert t1_fixture["rows"] == 1000
    assert t1_fixture["n_partitions"] == 4
    for epoch in ("e1", "e2"):
        d = os.path.join(root, epoch)
        parts = sorted(f for f in os.listdir(d) if f.startswith("part-"))
        assert len(parts) == 4
        t = pq.read_table(os.path.join(d, parts[0]))
        assert t.schema.equals(IMAGES_SCHEMA)
        assert t.num_rows == 250
        assert os.path.exists(os.path.join(d, "captions.parquet"))


def test_t1_deterministic(tmp_path):
    from raqc_ray.fixtures import generate

    r1 = str(tmp_path / "a")
    r2 = str(tmp_path / "b")
    generate(r1, "t1", seed=42)
    generate(r2, "t1", seed=42)
    a = pq.read_table(os.path.join(r1, "e1", "part-00000.parquet"))
    b = pq.read_table(os.path.join(r2, "e1", "part-00000.parquet"))
    assert a.equals(b)  # bit-identical from the same seed (FIXTURES.md)


def test_t1_corruptions_planted(t1_fixture):
    root = t1_fixture["root"]
    t = pq.read_table(os.path.join(root, "e1", "part-00000.parquet"))
    cap = t["caption"].to_pylist()
    bts = t["bytes"].to_pylist()
    w = t["w"].to_pylist()
    for i in PLAN.caption_null:
        assert cap[i] is None
    for i in PLAN.bytes_null:
        assert bts[i] is None
    assert w[10] == 0 and w[12] == 20_000
    assert bts[14] == b""
    for i in PLAN.caption_empty:
        assert cap[i] == ""
    # duplicated ids across partitions
    ids0 = t["image_id"].to_pylist()
    t1 = pq.read_table(os.path.join(root, "e1", "part-00001.parquet"))
    ids1 = t1["image_id"].to_pylist()
    assert ids0[17] in ids1  # pair (17, 250+17)


def test_expected_keys_shape(t1_fixture):
    keys = expected_violation_keys(t1_fixture, "e1")
    checks = {k[2] for k in keys}
    assert checks == {"nullity", "range", "caption", "decode", "uniqueness",
                      "near_dup", "referential", "expr", "exposure"}
    # nullity: 10, range: 5, caption: 5, decode: 10, uniqueness: 4 pairs→
    # (1 same-partition pair=1 row... see expected_violation_keys), near_dup: 12,
    # referential: 3+3+3, expr: 3 (min_area), exposure: 4 (darkened)
    n = {c: sum(1 for k in keys if k[2] == c) for c in checks}
    assert n["nullity"] == 10 and n["range"] == 5 and n["caption"] == 5
    assert n["decode"] == 10 and n["near_dup"] == 12 and n["referential"] == 9
    assert n["uniqueness"] == 7  # pair0 same-partition → 1; pairs 1-3 → 2 each
    assert n["expr"] == 3 and n["exposure"] == 4


def test_expected_pixels_sample(t1_fixture):
    d = os.path.join(t1_fixture["root"], "expected", "pixels", "e1")
    files = os.listdir(d)
    assert len(files) > 30
    arr = np.load(os.path.join(d, files[0]))
    assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8
