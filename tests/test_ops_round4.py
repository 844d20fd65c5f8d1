"""Round-4 operator gates: Bloom semi join, grouped checksum,
text normalization."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def test_bloom_member_mask_no_false_negatives():
    from raqc_ray.ops.bloomjoin import _member_mask, _probe_positions

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 40, 5000).astype(np.int64)
    num_bits, k = 1 << 16, 4
    bitset = np.zeros(num_bits // 8, dtype=np.uint8)
    pos = _probe_positions(keys, num_bits, k).ravel()
    np.bitwise_or.at(bitset, (pos >> np.uint64(3)).astype(np.int64),
                     np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    # every inserted key is a member (no false negatives, ever)
    assert _member_mask(keys, bitset, num_bits, k).all()
    # false-positive rate on fresh keys is near the analytic bound
    probe = rng.integers(1 << 41, 1 << 42, 20000).astype(np.int64)
    fp = _member_mask(probe, bitset, num_bits, k).mean()
    n, m = len(np.unique(keys)), num_bits
    expect = (1.0 - np.exp(-k * n / m)) ** k
    assert fp < 3 * expect + 0.01


def test_bloom_semi_join_matches_plain_semi_join(ray_session):
    from raqc_ray.ops.bloomjoin import bloom_semi_join
    from raqc_ray.ops.join import semi_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame({
        "k": rng.integers(0, 3000, 4000).astype(np.int64),
        "payload": rng.integers(0, 10, 4000).astype(np.int64),
    })
    right = pd.DataFrame({"rk": rng.integers(0, 700, 900).astype(np.int64)})
    lds = rd.from_pandas(left).repartition(7)
    rds = rd.from_pandas(right).repartition(5)
    got = (bloom_semi_join(lds, rds, on="k", right_on="rk",
                           num_bits=1 << 14)
           .to_pandas().sort_values(["k", "payload"]).reset_index(drop=True))
    want = (semi_join(rd.from_pandas(left).repartition(7),
                      rd.from_pandas(right).repartition(5),
                      on="k", right_on="rk")
            .to_pandas().sort_values(["k", "payload"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "payload"]],
                                  want[["k", "payload"]])


def test_grouped_checksum_order_and_layout_invariant(ray_session):
    from raqc_ray.ops.profile import grouped_checksum

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 600),
        "i": rng.integers(0, 1 << 30, 600).astype(np.int64),
        "s": [f"row{j}" for j in range(600)],
    })
    base = (grouped_checksum(rd.from_pandas(df).repartition(4), "g",
                             ["i", "s"]).to_pandas()
            .sort_values("g").reset_index(drop=True))
    shuffled = df.sample(frac=1.0, random_state=9).reset_index(drop=True)
    other = (grouped_checksum(rd.from_pandas(shuffled).repartition(11), "g",
                              ["i", "s"]).to_pandas()
             .sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, other)
    # a single changed row changes its group's checksum
    mut = df.copy()
    mut.loc[0, "s"] = "CHANGED"
    g0 = mut.loc[0, "g"]
    diff = (grouped_checksum(rd.from_pandas(mut).repartition(4), "g",
                             ["i", "s"]).to_pandas()
            .set_index("g")["checksum"])
    assert diff[g0] != base.set_index("g")["checksum"][g0]


def test_normalize_text_kernels(ray_session):
    from raqc_ray.ops.strings import normalize_text

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["  Hello, WORLD!!  ", "a--b__c  42", ""],
    })
    out = (normalize_text(rd.from_pandas(df), "text", ["doc_id"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["norm"].tolist() == ["hello world", "a b c 42", ""]
    assert out["n_norm_tokens"].tolist() == [2, 4, 0]
