"""Value-level oracles for the no-SQL-oracle dedup ops (VERDICT r1 #5).

Each op gets an independent slow-reference implementation (per-row
Python, the shape the vectorized kernels replaced) or a planted-pair
recall bound, so q17/q18/q19/q24/q26 are no longer rows-only checks.
"""

import hashlib

import numpy as np
import pandas as pd
import pytest


# ------------------------------------------------------------ references


def _ref_rolling(texts, k=16):
    """Per-byte Karp-Rabin reference (the pre-vectorization semantics)."""
    B, M = np.uint64(257), np.uint64((1 << 31) - 1)
    out = []
    for s in texts:
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < k:
            h = np.uint64(0)
            for x in b:
                h = (h * B + x) % M
            out.append(int(h))
            continue
        pw = np.ones(len(b), dtype=np.uint64)
        for i in range(1, len(b)):
            pw[i] = (pw[i - 1] * B) % M
        pref = np.zeros(len(b) + 1, dtype=np.uint64)
        for i, x in enumerate(b):
            pref[i + 1] = (pref[i] * B + x) % M
        bk = pw[k - 1] * B % M
        win = (pref[k:] + M - (pref[:-k] * bk) % M) % M
        out.append(int(win.min()))
    return np.array(out, dtype="uint64").astype("int64")


def _ref_simhash(texts):
    """Per-token Charikar reference (the pre-vectorization semantics)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            out[i] = 0
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        val = np.bitwise_or.reduce(
            (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        out[i] = int(val.astype(np.int64))
    return out


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(99)
    words = [f"tok{i}" for i in range(300)]
    texts = [" ".join(rng.choice(words, rng.integers(5, 120)))
             for _ in range(300)]
    texts += ["", "one", "exactly sixteen!", "ünïcödé 漢字 test ünïcödé 漢字"]
    return texts


def test_rolling_fingerprint_matches_reference(corpus):
    from raqc_ray.ops.text import rolling_fingerprint

    df = pd.DataFrame({"doc_id": np.arange(len(corpus)), "text": corpus})
    got = rolling_fingerprint(df)["fp_rolling"].to_numpy()
    assert (got == _ref_rolling(corpus)).all()


def test_simhash_matches_reference(corpus):
    from raqc_ray.ops.dedup import simhash64

    got = simhash64(pd.Series(corpus))
    assert (got == _ref_simhash(corpus)).all()


def test_minhash_est_matches_signature_agreement(ray_session):
    """q17 values: est_jaccard of every reported pair must equal the
    brute-force signature-agreement fraction of that doc pair."""
    import ray.data as rd

    from raqc_ray.ops.dedup import MinHasher, minhash_lsh_pairs

    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(100)]
    base = [" ".join(rng.choice(words, 60)) for _ in range(60)]
    texts = list(base)
    texts[10] = texts[0]                       # exact dup
    texts[11] = texts[1] + " extra tail"       # near dup
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    pairs = minhash_lsh_pairs(rd.from_pandas(df).repartition(3),
                              threshold=0.3).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(pairs["doc_a"], pairs["doc_b"], pairs["est_jaccard"])}
    assert (0, 10) in got and got[(0, 10)] == 1.0
    assert (1, 11) in got
    hasher = MinHasher()
    sig = {i: hasher.signature(t) for i, t in enumerate(texts)}
    for (a, b), est in got.items():
        agree = float((sig[a] == sig[b]).mean())
        assert est == pytest.approx(agree), (a, b)


def test_ngram_jaccard_values_exact(ray_session):
    """q26 values: reported jaccard equals exact set-Jaccard of shingle
    hashes recomputed independently."""
    import ray.data as rd

    from raqc_ray.ops.dedup import (_shingle_hashes, _token_hash,
                                    ngram_jaccard_pairs)

    rng = np.random.default_rng(26)
    words = [f"w{i}" for i in range(80)]
    texts = [" ".join(rng.choice(words, 50)) for _ in range(50)]
    texts[20] = texts[2]                                  # jaccard 1.0
    texts[21] = texts[3] + " " + " ".join(texts[3].split()[:10])
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    pairs = ngram_jaccard_pairs(rd.from_pandas(df).repartition(3),
                                threshold=0.4).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(pairs["doc_a"], pairs["doc_b"], pairs["jaccard"])}
    assert got[(2, 20)] == 1.0

    def shingles(t):
        toks = t.split()
        th = np.fromiter((_token_hash(x) for x in toks), dtype=np.uint64,
                         count=len(toks))
        return set(_shingle_hashes(th, 3).tolist())

    for (a, b), j in got.items():
        sa, sb = shingles(texts[a]), shingles(texts[b])
        exact = len(sa & sb) / len(sa | sb)
        assert j == pytest.approx(exact, abs=1e-6), (a, b)


def test_embedding_dup_recall(ray_session):
    """q19 recall: multi-table LSH must recover ≥0.9 of planted
    cosine≥0.95 pairs (VERDICT r1 item 8)."""
    import ray.data as rd

    from raqc_ray.ops.dedup import embedding_dup_pairs

    rng = np.random.default_rng(42)
    n, dim = 2000, 64
    emb = rng.normal(size=(n, dim))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    planted = []
    for k in range(40):
        i, j = 2 * k, 2 * k + 1
        v = emb[i] + rng.normal(size=dim) * 0.04
        v /= np.linalg.norm(v)
        if float(emb[i] @ v) >= 0.95:
            emb[j] = v
            planted.append((i, j))
    assert len(planted) >= 20
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": list(emb.astype(np.float32))}
    )).repartition(4)
    got = embedding_dup_pairs(ds, threshold=0.95).to_pandas()
    gotset = set(zip(got["vec_a"], got["vec_b"]))
    hits = sum((min(a, b), max(a, b)) in gotset for a, b in planted)
    assert hits / len(planted) >= 0.9
    # every reported cosine is exact (verify against numpy)
    for a, b, c in zip(got["vec_a"], got["vec_b"], got["cosine"]):
        assert c == pytest.approx(float(emb[a] @ emb[b]), abs=2e-3)


def test_exact_cosine_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from raqc_ray.ops.dedup import exact_cosine_pairs

    rng = np.random.default_rng(7)
    n, dim = 400, 64
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": list(emb)})).repartition(4)
    got = exact_cosine_pairs(ds, threshold=0.3).to_pandas()
    unit = emb.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    sim = unit @ unit.T
    ii, jj = np.nonzero(np.triu(sim >= 0.3, k=1))
    want = {(int(a), int(b)): sim[a, b] for a, b in zip(ii, jj)}
    assert len(got) == len(want)
    for a, b, c in zip(got["vec_a"], got["vec_b"], got["cosine"]):
        assert c == pytest.approx(want[(a, b)], abs=1e-5)


def test_hash_join_matches_pandas(ray_session):
    import ray.data as rd

    from raqc_ray.ops.join import hash_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500),
                         "v": np.arange(500)})
    right = pd.DataFrame({"rk": np.arange(40), "w": np.arange(40) * 10})
    got = hash_join(rd.from_pandas(left).repartition(4),
                    rd.from_pandas(right).repartition(2),
                    on="k", right_on="rk", num_partitions=4).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk")
    assert len(got) == len(want)
    a = got.sort_values(["k", "v"]).reset_index(drop=True)
    b = want.sort_values(["k", "v"]).reset_index(drop=True)
    assert (a["v"].to_numpy() == b["v"].to_numpy()).all()
    assert (a["w"].to_numpy() == b["w"].to_numpy()).all()


def test_lsh_pairs_subset_of_exact(ray_session):
    """Consistency: every LSH-reported embedding pair must appear in the
    exact all-pairs result with the same cosine (LSH ⊆ exact)."""
    import ray.data as rd

    from raqc_ray.ops.dedup import embedding_dup_pairs, exact_cosine_pairs

    rng = np.random.default_rng(5)
    n, dim = 800, 64
    emb = rng.normal(size=(n, dim))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    for k in range(15):
        v = emb[3 * k] + rng.normal(size=dim) * 0.05
        emb[3 * k + 1] = v / np.linalg.norm(v)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": list(emb.astype(np.float32))}
    )).repartition(3)
    lsh = embedding_dup_pairs(ds, threshold=0.9).to_pandas()
    exact = exact_cosine_pairs(ds, threshold=0.9).to_pandas()
    ex = {(a, b): c for a, b, c in
          zip(exact["vec_a"], exact["vec_b"], exact["cosine"])}
    assert len(lsh) > 0
    for a, b, c in zip(lsh["vec_a"], lsh["vec_b"], lsh["cosine"]):
        assert (a, b) in ex
        assert c == pytest.approx(ex[(a, b)], abs=1e-5)


def test_hash_join_left_outer(ray_session):
    import ray.data as rd

    from raqc_ray.ops.join import hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    right = pd.DataFrame({"rk": [2, 4], "w": ["b", "d"]})
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", right_on="rk", how="left_outer",
                    num_partitions=2).to_pandas().sort_values("k")
    assert list(got["k"]) == [1, 2, 3, 4]
    matched = got.set_index("k")["w"]
    assert matched[2] == "b" and matched[4] == "d"
    assert pd.isna(matched[1]) and pd.isna(matched[3])
