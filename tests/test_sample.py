"""Deterministic hash sampling / splitting (ops/sample.py): rate
accuracy, layout invariance, cross-run stability, key-unit semantics,
and split-boundary exactness (q39/q40 oracle-check the SQL parity)."""

import numpy as np
import pandas as pd
import pytest

from raqc_ray.ops.sample import _A, _M, _lehmer


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def test_lehmer_reference_values():
    keys = np.array([0, 1, 2, 10**12], dtype=np.int64)
    want = [((int(k) * _A) % _M) * _A % _M for k in keys]
    assert _lehmer(keys, 0).tolist() == want
    assert _lehmer(keys, 5).tolist() == [
        (((int(k) + 5) * _A) % _M) * _A % _M for k in keys
    ]


def test_hash_sample_rate_and_invariance(rd):
    from raqc_ray.ops.sample import hash_sample

    df = pd.DataFrame({"k": np.arange(20_000, dtype=np.int64),
                       "v": np.arange(20_000)})
    kept = []
    for nparts in (1, 8):
        out = (hash_sample(rd.from_pandas(df).repartition(nparts),
                           "k", rate=0.2, salt=3)
               .to_pandas().sort_values("k").reset_index(drop=True))
        kept.append(out)
    pd.testing.assert_frame_equal(kept[0], kept[1])  # layout-invariant
    frac = len(kept[0]) / len(df)
    assert 0.18 < frac < 0.22
    # duplicate keys travel together
    dup = pd.DataFrame({"k": np.repeat(np.arange(500, dtype=np.int64), 3),
                        "v": np.arange(1500)})
    out = hash_sample(rd.from_pandas(dup), "k", 0.3, salt=1).to_pandas()
    assert (out.groupby("k").size() == 3).all()


def test_hash_sample_salt_decorrelates(rd):
    from raqc_ray.ops.sample import hash_sample

    df = pd.DataFrame({"k": np.arange(10_000, dtype=np.int64)})
    a = set(hash_sample(rd.from_pandas(df), "k", 0.1, salt=0)
            .to_pandas()["k"])
    b = set(hash_sample(rd.from_pandas(df), "k", 0.1, salt=99)
            .to_pandas()["k"])
    overlap = len(a & b) / max(1, len(a))
    assert overlap < 0.25  # independent 10% samples overlap ~10%


def test_hash_split_fractions_exhaustive_and_stable(rd):
    from raqc_ray.ops.sample import hash_split

    df = pd.DataFrame({"k": np.arange(30_000, dtype=np.int64)})
    out = hash_split(rd.from_pandas(df).repartition(6), "k",
                     {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    counts = out["split"].value_counts(normalize=True)
    assert abs(counts.get("train", 0) - 0.8) < 0.02
    assert abs(counts.get("val", 0) - 0.1) < 0.01
    assert abs(counts.get("test", 0) - 0.1) < 0.01
    assert set(out["split"]) <= {"train", "val", "test", "rest"}
    # every row labeled, none dropped
    assert len(out) == len(df)
    # growing the dataset never relabels an old row
    out2 = hash_split(rd.from_pandas(df.iloc[:1000]), "k",
                      {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    merged = out.set_index("k").loc[out2["k"]]["split"]
    assert (merged.to_numpy() == out2["split"].to_numpy()).all()


def test_hash_split_validates_fractions(rd):
    from raqc_ray.ops.sample import hash_sample, hash_split

    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    with pytest.raises(ValueError):
        hash_split(rd.from_pandas(df), "k", {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        hash_sample(rd.from_pandas(df), "k", 1.5)
