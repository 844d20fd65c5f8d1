"""Connected components + hamming pairs: randomized equivalence vs an
independent union-find reference, plus centroid/linreg determinism."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _union_find_cc(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 30, 25), (1, 60, 80),
                                                  (2, 100, 40)])
def test_connected_components_random(rd, seed, n_nodes, n_edges):
    from raqc_ray.ops.concomp import connected_components

    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    got = (connected_components(
        rd.from_pandas(pd.DataFrame({"a": a, "b": b})))
        .to_pandas())
    want = _union_find_cc(zip(a.tolist(), b.tolist()))
    assert dict(zip(got["node"], got["cluster_id"])) == want


def test_connected_components_chain(rd):
    # a path graph needs multiple star rounds: 0-1-2-...-9
    from raqc_ray.ops.concomp import connected_components

    df = pd.DataFrame({"a": np.arange(9, dtype=np.int64),
                       "b": np.arange(1, 10, dtype=np.int64)})
    got = connected_components(rd.from_pandas(df)).to_pandas()
    assert sorted(got["node"].tolist()) == list(range(10))
    assert set(got["cluster_id"].tolist()) == {0}


def test_hamming_pairs_exact(rd):
    from raqc_ray.ops.concomp import hamming_pairs

    rng = np.random.default_rng(7)
    n = 120
    h = rng.integers(0, 2**63 - 1, n).astype(np.int64)
    # plant near-dups: ids 2k+1 copy 2k with ≤2 bits flipped
    for k in range(0, n - 1, 2):
        flips = rng.integers(1, 3)
        v = h[k]
        for _ in range(flips):
            v ^= np.int64(1) << rng.integers(0, 64)
        h[k + 1] = v
    ids = np.arange(n, dtype=np.int64)
    got = hamming_pairs(
        rd.from_pandas(pd.DataFrame({"doc_id": ids, "phash": h})),
        "doc_id", "phash", max_hamming=2).to_pandas()
    got_set = set(zip(got["a"], got["b"]))
    hu = h.view(np.uint64)
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if bin(int(hu[i] ^ hu[j])).count("1") <= 2:
                want.add((i, j))
    assert got_set == want


def test_grouped_centroid_matches_numpy(rd):
    from raqc_ray.ops.embstats import grouped_centroid

    rng = np.random.default_rng(3)
    n, d = 200, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    lab = rng.integers(0, 4, n)
    df = pd.DataFrame({"label": lab, "embedding": list(emb)})
    out = (grouped_centroid(rd.from_pandas(df), "label", "embedding",
                            dim=d, scale=10**7).to_pandas()
           .sort_values(["label", "pos"]).reset_index(drop=True))
    for k in range(4):
        ref = np.floor(emb[lab == k].astype(np.float64) * 1e7).sum(0)
        ref = ref / (lab == k).sum() / 1e7
        got = out.loc[out.label == k, "centroid"].to_numpy()
        np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_grouped_linreg_matches_numpy(rd):
    from raqc_ray.ops.moments import grouped_linreg

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "k": rng.integers(0, 3, 400),
        "x": rng.random(400) * 10,
    })
    df["y"] = 2.5 * df["x"] + 1.0 + rng.standard_normal(400)
    out = (grouped_linreg(rd.from_pandas(df), "k", "x", "y")
           .to_pandas().set_index("k"))
    for k, g in df.groupby("k"):
        sl, ic = np.polyfit(g["x"], g["y"], 1)
        assert out.loc[k, "slope"] == pytest.approx(sl, abs=1e-4)
        assert out.loc[k, "intercept"] == pytest.approx(ic, abs=1e-4)
        assert 0.8 < out.loc[k, "r2"] <= 1.0


def test_vq_assign_tiebreak_and_nearest(rd):
    from raqc_ray.ops.embstats import vq_assign

    cb = np.array([[0.0, 0.0], [10.0, 0.0], [5.0, 0.0]])
    labels = np.array([7, 3, 5])  # unsorted on purpose
    emb = np.array([[0.1, 0.0],    # → label 7 (closest to origin)
                    [9.0, 0.0],    # → label 3
                    [2.5, 0.0],    # tie between 0.0 and 5.0 → smaller label 5
                    [5.1, 0.0]],   # → label 5
                   dtype=np.float32)
    df = pd.DataFrame({"vec_id": np.arange(4, dtype=np.int64),
                       "embedding": list(emb)})
    out = (vq_assign(rd.from_pandas(df), "vec_id", "embedding", 2,
                     labels, cb).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert out["vq_label"].tolist() == [7, 3, 5, 5]


def test_grouped_collect_set_sorted(rd):
    from raqc_ray.ops.distinct import grouped_collect_set

    df = pd.DataFrame({"k": [1, 1, 1, 2, 2],
                       "v": ["b", "a", "b", "z", "z"]})
    out = (grouped_collect_set(rd.from_pandas(df), "k", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert out["vals"].tolist() == ["a,b", "z"]
    assert out["n_distinct"].tolist() == [2, 1]


def test_grouped_median_mad_exact(rd):
    from raqc_ray.ops.quantile_exact import grouped_median_mad

    df = pd.DataFrame({"k": ["a"] * 4 + ["b"] * 5,
                       "v": [1.0, 2.0, 4.0, 9.0, 3, 1, 7, 5, 9]})
    out = (grouped_median_mad(rd.from_pandas(df), "k", "v").to_pandas()
           .set_index("k"))
    # a: median (2+4)/2 = 3; devs |1-3,2-3,4-3,9-3| = 2,1,1,6 → (1+2)/2=1.5
    assert out.loc["a", "median"] == 3.0 and out.loc["a", "mad"] == 1.5
    # b: sorted 1,3,5,7,9 → median 5; devs 4,2,0,2,4 → mad 2
    assert out.loc["b", "median"] == 5.0 and out.loc["b", "mad"] == 2.0
    assert out["n"].tolist() == [4, 5]


def test_grouped_entropy_closed_form(rd):
    from raqc_ray.ops.entropy import grouped_entropy

    df = pd.DataFrame({"k": ["a"] * 4 + ["b"] * 3,
                       "v": ["x", "y", "x", "y", "z", "z", "z"]})
    out = (grouped_entropy(rd.from_pandas(df), "k", "v").to_pandas()
           .set_index("k"))
    assert out.loc["a", "entropy"] == pytest.approx(np.log(2), abs=1e-6)
    assert out.loc["b", "entropy"] == 0.0
    assert out.loc["a", "n_distinct"] == 2 and out.loc["b", "n"] == 3


def test_dedup_corpus_planted_clusters(rd):
    from raqc_ray.ops.dedup import dedup_corpus

    bases = {
        100: ("the quick brown fox jumps over the lazy dog again and "
              "again while the band plays on through the night"),
        200: ("pack my box with five dozen liquor jugs said the "
              "wizard as the sphinx of black quartz judged his vow"),
        300: ("colorless green ideas sleep furiously under a bright "
              "crimson moon that rises slowly over the silent harbor"),
    }
    rows = []
    # three planted near-dup clusters of sizes 3/2/2 + distinct docs
    for cid, size in ((100, 3), (200, 2), (300, 2)):
        for j in range(size):
            rows.append((cid + j, bases[cid] + f" tail {'x' * j}"))
    for i in range(20):
        rows.append((i, f"completely unrelated document number {i} "
                        f"with its own words like token{i} and item{i} "
                        f"plus filler content {i * 17} {i * 31} {i * 53}"))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    kept, clusters = dedup_corpus(rd.from_pandas(df), threshold=0.5)
    kept_ids = set(kept.to_pandas()["doc_id"].tolist())
    # representatives of the planted clusters survive, other members don't
    for cid, size in ((100, 3), (200, 2), (300, 2)):
        members = {cid + j for j in range(size)}
        assert members & kept_ids == {cid}
    # unrelated docs all survive
    assert set(range(20)) <= kept_ids
    # cluster assignment maps every planted member to its minimum
    cmap = dict(zip(clusters["node"], clusters["cluster_id"]))
    for cid, size in ((100, 3), (200, 2), (300, 2)):
        for j in range(size):
            assert cmap[cid + j] == cid


def test_dedup_corpus_paths_equivalent(rd):
    from raqc_ray.ops.dedup import dedup_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" v{i % 3}") for i in range(12)]
    rows += [(100 + i, f"unique doc {i} with words w{i} q{i} r{i} s{i}")
             for i in range(8)]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    k1, _ = dedup_corpus(rd.from_pandas(df), broadcast_limit=10**6)
    k2, _ = dedup_corpus(rd.from_pandas(df), broadcast_limit=0)
    a = sorted(k1.to_pandas()["doc_id"].tolist())
    b = sorted(k2.to_pandas()["doc_id"].tolist())
    assert a == b and len(a) < len(df)


def test_grouped_cooccurrence_counts(rd):
    from raqc_ray.ops.cooc import grouped_cooccurrence

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2, 3, 3, 3],
        "v": ["a", "b", "a", "c", "a", "b", "b", "c", "b"],
    })
    out = grouped_cooccurrence(rd.from_pandas(df), "k", "v").to_pandas()
    got = {(r.val_a, r.val_b): r.n for r in out.itertuples()}
    # k1 has {a,b,c}, k2 {a,b}, k3 {b,c}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 2}


def test_tfidf_terms_closed_form(rd):
    from raqc_ray.ops.unnest import tfidf_terms

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "src": ["s1", "s1", "s2", "s2"],
        "text": ["cat dog", "cat cat", "dog fish", "fish fish"],
    })
    out = tfidf_terms(rd.from_pandas(df), "src", "doc_id", "text").to_pandas()
    got = {(r.src, r.token): (r.tf, r.df, r.tfidf) for r in out.itertuples()}
    # cat: tf(s1)=3, df=2, idf=ln(4/2)
    assert got[("s1", "cat")] == (3, 2, round(3 * np.log(2.0), 6))
    # fish: tf(s2)=3, df=2
    assert got[("s2", "fish")] == (3, 2, round(3 * np.log(2.0), 6))
    # dog appears in docs 1 and 3 → df=2, tf 1 in each source
    assert got[("s1", "dog")] == (1, 2, round(np.log(2.0), 6))
    assert got[("s2", "dog")] == (1, 2, round(np.log(2.0), 6))


@pytest.mark.parametrize("nblocks", [1, 7])
def test_new_ops_layout_invariance(rd, nblocks):
    """Block layout must not change any output bit: quantized centroid,
    rank windows, share-of-total and hist1d re-run over a repartitioned
    input and compare exactly against the 3-block baseline."""
    from raqc_ray.ops.embstats import grouped_centroid
    from raqc_ray.ops.moments import grouped_hist1d, grouped_share
    from raqc_ray.ops.window import grouped_rank

    rng = np.random.default_rng(11)
    n, d = 300, 6
    emb = rng.standard_normal((n, d)).astype(np.float32)
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 7, n).astype(np.int64),
        "v": np.floor(rng.random(n) * 40).astype(np.int64),
        "embedding": list(emb),
    })

    def mk(nb):
        return rd.from_pandas(df).repartition(nb)

    base, alt = mk(3), mk(nblocks)

    c1 = (grouped_centroid(base, "k", "embedding", dim=d).to_pandas()
          .sort_values(["k", "pos"]).reset_index(drop=True))
    c2 = (grouped_centroid(alt, "k", "embedding", dim=d).to_pandas()
          .sort_values(["k", "pos"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(c1, c2)

    def rank_df(ds):
        res = grouped_rank(
            ds.select_columns(["id", "k", "v"]), key="k", order_by="v")
        return (res.to_pandas()
                .sort_values("id").reset_index(drop=True)
                [["id", "k", "v", "rank", "dense_rank", "pct_rank"]])

    pd.testing.assert_frame_equal(rank_df(base), rank_df(alt),
                                  check_dtype=False)

    s1 = (grouped_share(base.select_columns(["id", "k", "v"]), "k", "v")
          .to_pandas().sort_values("id").reset_index(drop=True))
    s2 = (grouped_share(alt.select_columns(["id", "k", "v"]), "k", "v")
          .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(s1, s2, check_dtype=False)

    h1 = (grouped_hist1d(base.select_columns(["k", "v"]), "k", "v", 8.0)
          .to_pandas().sort_values(["k", "bucket"]).reset_index(drop=True))
    h2 = (grouped_hist1d(alt.select_columns(["k", "v"]), "k", "v", 8.0)
          .to_pandas().sort_values(["k", "bucket"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(h1, h2, check_dtype=False)


@pytest.mark.parametrize("nblocks", [2, 9])
def test_heavy_hitters_guarantees(rd, nblocks):
    """Misra-Gries guarantees on zipf-ish data: every true heavy hitter
    (count > total error) is reported, and every reported [lo, hi]
    brackets the true count."""
    from raqc_ray.ops.heavyhitters import approx_heavy_hitters

    rng = np.random.default_rng(13)
    vals = [f"tok{z}" for z in rng.zipf(1.4, 8000) if z < 5000]
    df = pd.DataFrame({"v": vals})
    truth = df["v"].value_counts().to_dict()
    out = approx_heavy_hitters(rd.from_pandas(df).repartition(nblocks),
                               "v", m=32).to_pandas()
    got = {r.value: (r.count_lo, r.count_hi) for r in out.itertuples()}
    total_err = (next(iter(got.values()))[1]
                 - next(iter(got.values()))[0]) if got else 0
    for v, n in truth.items():
        if n > total_err:
            assert v in got, (v, n, total_err)
        if v in got:
            lo, hi = got[v]
            assert lo <= n <= hi, (v, n, lo, hi)


@pytest.mark.parametrize("nblocks", [2, 6])
def test_kmeans_recovers_blobs(rd, nblocks):
    from raqc_ray.ops.embstats import kmeans_fit

    rng = np.random.default_rng(21)
    d, per = 8, 60
    centers = np.array([[10.0] * d, [-10.0] * d,
                        [10.0] * 4 + [-10.0] * 4])
    emb, truth = [], []
    for ci, c in enumerate(centers):
        emb.append(c + 0.5 * rng.standard_normal((per, d)))
        truth += [ci] * per
    emb = np.vstack(emb).astype(np.float32)
    order = rng.permutation(len(emb))
    df = pd.DataFrame({"id": np.arange(len(emb), dtype=np.int64),
                       "embedding": list(emb[order])})
    truth = np.array(truth)[order]
    assign, labels, cb = kmeans_fit(
        rd.from_pandas(df).repartition(nblocks), "id", "embedding",
        dim=d, k=3)
    out = assign.to_pandas().sort_values("id").reset_index(drop=True)
    got = out["vq_label"].to_numpy()
    # same-blob rows share a cluster; different blobs don't
    for ci in range(3):
        blob = got[truth == ci]
        assert (blob == blob[0]).all()
    assert len({got[truth == 0][0], got[truth == 1][0],
                got[truth == 2][0]}) == 3


def test_kmeans_layout_invariant(rd):
    from raqc_ray.ops.embstats import kmeans_fit

    rng = np.random.default_rng(22)
    emb = rng.standard_normal((150, 5)).astype(np.float32)
    df = pd.DataFrame({"id": np.arange(150, dtype=np.int64),
                       "embedding": list(emb)})

    def run(nb):
        assign, _, cb = kmeans_fit(rd.from_pandas(df).repartition(nb),
                                   "id", "embedding", dim=5, k=4,
                                   n_iter=8)
        return (assign.to_pandas().sort_values("id")
                .reset_index(drop=True), cb)

    a1, cb1 = run(2)
    a2, cb2 = run(7)
    pd.testing.assert_frame_equal(a1, a2)
    np.testing.assert_array_equal(cb1, cb2)


def test_checksums_layout_invariant(ray_session):
    """Convergence detection must not depend on block layout: per-block
    int64 partials wrap while Ray's Sum merges in Python ints, so the
    raw totals differ across layouts — the mod-2^64 reduction restores
    invariance (this broke convergence at >=1e7 edges)."""
    import ray.data as rd

    from raqc_ray.ops.concomp import _checksums

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "u": rng.integers(1, 1 << 62, 50_000).astype(np.int64),
        "v": rng.integers(1, 1 << 62, 50_000).astype(np.int64),
    })
    one = _checksums(rd.from_pandas(df))
    many = _checksums(rd.from_pandas(
        [df.iloc[i::13] for i in range(13)]))
    assert one == many
    assert 0 <= one[1] <= (1 << 64) - 1
