import numpy as np

from raqc_ray.sketches import HyperLogLog, TDigest


def test_hll_accuracy_and_merge():
    vals = [f"id-{i}" for i in range(20_000)]
    h = HyperLogLog()
    h.add(vals)
    assert abs(h.estimate() - 20_000) / 20_000 < 0.03  # FIXTURES.md §4 bound

    # merge associativity / order-insensitivity
    parts = []
    for k in range(7):
        s = HyperLogLog()
        s.add(vals[k * 3000 : (k + 1) * 3000 + 500])  # overlapping slices
        parts.append(s)
    a = HyperLogLog.merge_all(parts).estimate()
    b = HyperLogLog.merge_all(parts[::-1]).estimate()
    assert a == b
    assert abs(a - h.estimate()) / 20_000 < 0.03


def test_hll_serde():
    h = HyperLogLog()
    h.add([f"x{i}" for i in range(1000)])
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert h2.estimate() == h.estimate()


def test_tdigest_rank_error():
    rng = np.random.default_rng(5)
    data = np.concatenate([rng.normal(0, 1, 50_000), rng.exponential(3, 50_000)])
    td = TDigest()
    for chunk in np.array_split(data, 23):
        td.add(chunk)
    for q in (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99):
        est = td.quantile(q)
        rank = float((data < est).mean())
        assert abs(rank - q) <= 0.01, (q, rank)  # FIXTURES.md §4 bound


def test_tdigest_merge_deterministic_and_accurate():
    rng = np.random.default_rng(6)
    data = rng.normal(100, 20, 80_000)
    parts = []
    for chunk in np.array_split(data, 16):
        t = TDigest()
        t.add(chunk)
        parts.append(t)
    m1 = TDigest.merge_all(parts)
    m2 = TDigest.merge_all(parts[::-1])
    for q in (0.05, 0.5, 0.95):
        assert m1.quantile(q) == m2.quantile(q)  # order-canonicalized
        rank = float((data < m1.quantile(q)).mean())
        assert abs(rank - q) <= 0.015


def test_tdigest_cdf_inverse():
    rng = np.random.default_rng(8)
    data = rng.uniform(0, 1000, 50_000)
    td = TDigest()
    td.add(data)
    for q in (0.1, 0.5, 0.9):
        x = td.quantile(q)
        assert abs(td.cdf(x) - q) < 0.02
    assert td.cdf(td.min - 1) == 0.0
    assert td.cdf(td.max + 1) == 1.0


def test_tdigest_serde_and_nan():
    td = TDigest()
    td.add(np.array([1.0, np.nan, 3.0, np.nan, 5.0]))
    assert td.n == 3
    td2 = TDigest.from_bytes(td.to_bytes())
    assert td2.quantile(0.5) == td.quantile(0.5)
