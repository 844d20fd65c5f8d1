"""Round-5 ops: grouped two-predictor OLS and pairwise source
vocabulary overlap — closed-form planted fixtures, degenerate-key
drops, layout invariance, headroom guard."""

import numpy as np
import pandas as pd
import pytest


def _ds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


# ------------------------------------------------------------- grouped_ols2

def test_ols2_recovers_planted_coefficients(ray_session):
    from raqc_ray.ops.regression import grouped_ols2

    rng = np.random.default_rng(3)
    n = 4000
    x1 = rng.integers(0, 24, n)
    x2 = rng.integers(0, 30, n)
    # exact integer relationship -> zero residual -> exact recovery
    y = 7 + 3 * x1 - 2 * x2
    df = pd.DataFrame({"k": rng.integers(0, 5, n), "x1": x1,
                       "x2": x2, "y": y})
    out = (grouped_ols2(_ds(df), "k", "x1", "x2", "y").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert len(out) == 5
    assert np.allclose(out["b0"], 7.0, atol=1e-5)
    assert np.allclose(out["b1"], 3.0, atol=1e-5)
    assert np.allclose(out["b2"], -2.0, atol=1e-5)


def test_ols2_drops_degenerate_keys(ray_session):
    from raqc_ray.ops.regression import grouped_ols2

    df = pd.DataFrame({
        # key 1: constant x1 (singular); key 2: n < 3; key 3: healthy
        "k": [1] * 10 + [2] * 2 + [3] * 10,
        "x1": [5] * 10 + [1, 2] + list(range(10)),
        "x2": list(range(10)) + [1, 2] + [v * v for v in range(10)],
        "y": list(range(10)) + [1, 2] + list(range(10)),
    })
    out = grouped_ols2(_ds(df, 2), "k", "x1", "x2", "y").to_pandas()
    assert sorted(out["k"].tolist()) == [3]


def test_ols2_layout_invariance_and_oracle(ray_session):
    import duckdb

    from raqc_ray.ops.regression import grouped_ols2

    rng = np.random.default_rng(11)
    n = 6000
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "x1": rng.integers(0, 24, n),
        "x2": rng.integers(0, 365, n),
        "y": rng.integers(-500, 2000, n),
    })
    outs = [(grouped_ols2(_ds(df, p), "k", "x1", "x2", "y").to_pandas()
             .sort_values("k").reset_index(drop=True))
            for p in (1, 13)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    con = duckdb.connect()
    con.register("t", df)
    ora = con.execute("""
        WITH m AS (
            SELECT k, COUNT(*) AS n, SUM(x1) sx1, SUM(x2) sx2,
                   SUM(y) sy, SUM(x1*x1) sx1x1, SUM(x1*x2) sx1x2,
                   SUM(x2*x2) sx2x2, SUM(x1*y) sx1y, SUM(x2*y) sx2y
            FROM t GROUP BY k HAVING COUNT(*) >= 3
        ), c AS (
            SELECT k, n, CAST(n AS DOUBLE) nf,
                   CAST(sx1 AS DOUBLE) fsx1, CAST(sx2 AS DOUBLE) fsx2,
                   CAST(sy AS DOUBLE) fsy,
                   CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
                       * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) c11,
                   CAST(sx1x2 AS DOUBLE) - CAST(sx1 AS DOUBLE)
                       * CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE) c12,
                   CAST(sx2x2 AS DOUBLE) - CAST(sx2 AS DOUBLE)
                       * CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE) c22,
                   CAST(sx1y AS DOUBLE) - CAST(sx1 AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) c1y,
                   CAST(sx2y AS DOUBLE) - CAST(sx2 AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) c2y
            FROM m
        ), b AS (
            SELECT k, n, nf, fsx1, fsx2, fsy,
                   (c1y*c22 - c2y*c12) / (c11*c22 - c12*c12) b1,
                   (c2y*c11 - c1y*c12) / (c11*c22 - c12*c12) b2
            FROM c WHERE c11*c22 - c12*c12 <> 0
        )
        SELECT k, CAST(n AS BIGINT) n,
               ROUND((fsy - b1*fsx1 - b2*fsx2) / nf, 6) b0,
               ROUND(b1, 6) b1, ROUND(b2, 6) b2
        FROM b ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(outs[0], ora, check_dtype=False,
                                  atol=1e-6, rtol=0)


def test_ols2_headroom_guard(ray_session):
    from raqc_ray.ops.regression import grouped_ols2

    df = pd.DataFrame({
        "k": [1] * 4,
        "x1": [2 ** 31] * 4,
        "x2": [1, 2, 3, 4],
        "y": [2 ** 31, 1, 2, 3],
    })
    with pytest.raises(Exception, match="headroom"):
        grouped_ols2(_ds(df, 1), "k", "x1", "x2", "y").to_pandas()


# -------------------------------------------- weighted quantile / topk freq

def test_weighted_quantile_matches_expansion(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_weighted_quantile_cont

    rng = np.random.default_rng(9)
    n = 3000
    df = pd.DataFrame({"k": rng.integers(0, 6, n),
                       "v": rng.integers(0, 500, n),
                       "w": rng.integers(0, 8, n)})  # incl. zero weights
    out = (grouped_weighted_quantile_cont(_ds(df, 7), "k", "v", "w",
                                          qs=(0.25, 0.5))
           .to_pandas().sort_values("k").reset_index(drop=True))
    # brute-force: literally expand the multiset
    exp = df.loc[df.index.repeat(df["w"])]
    for _, row in out.iterrows():
        g = np.sort(exp[exp["k"] == row["k"]]["v"].to_numpy())
        assert row["w_total"] == len(g)
        assert row["wq0_25"] == pytest.approx(
            np.quantile(g, 0.25, method="linear"))
        assert row["wq0_5"] == pytest.approx(
            np.quantile(g, 0.5, method="linear"))


def test_weighted_quantile_layout_invariance(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_weighted_quantile_cont

    rng = np.random.default_rng(21)
    df = pd.DataFrame({"k": rng.integers(0, 40, 8000),
                       "v": rng.integers(0, 100, 8000),
                       "w": rng.integers(1, 20, 8000)})
    outs = [(grouped_weighted_quantile_cont(_ds(df, p), "k", "v", "w")
             .to_pandas().sort_values("k").reset_index(drop=True))
            for p in (1, 17)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_topk_frequent_closed_form(ray_session):
    from raqc_ray.ops.argmax import grouped_topk_frequent

    df = pd.DataFrame({
        "k": [1] * 10 + [2] * 4,
        "v": ["a"] * 4 + ["b"] * 3 + ["c"] * 2 + ["d"] * 1
             + ["x", "y", "x", "z"],
    })
    out = (grouped_topk_frequent(_ds(df, 3), "k", "v", k=3)
           .to_pandas().sort_values(["k", "rank"])
           .reset_index(drop=True))
    k1 = out[out["k"] == 1]
    assert k1["v"].tolist() == ["a", "b", "c"]
    assert k1["n"].tolist() == [4, 3, 2]
    k2 = out[out["k"] == 2]
    # ties (y=1, z=1) break to the smaller value
    assert k2["v"].tolist() == ["x", "y", "z"]
    assert k2["n"].tolist() == [2, 1, 1]
    assert k2["rank"].tolist() == [1, 2, 3]


def test_topk_frequent_layout_and_reference(ray_session):
    from raqc_ray.ops.argmax import grouped_topk_frequent

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"k": rng.integers(0, 25, 9000),
                       "v": rng.integers(0, 30, 9000)})
    outs = [(grouped_topk_frequent(_ds(df, p), "k", "v", k=2)
             .to_pandas().sort_values(["k", "rank"])
             .reset_index(drop=True))
            for p in (1, 11)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # reference recompute for one key
    kk = int(df["k"].iloc[0])
    cnt = df[df["k"] == kk]["v"].value_counts()
    top = sorted(((-n, v) for v, n in cnt.items()))[:2]
    row = outs[0][outs[0]["k"] == kk]
    assert row["v"].tolist() == [v for _, v in top]
    assert row["n"].tolist() == [-n for n, _ in top]


# --------------------------------------------------- unigram KL by source

def test_unigram_kl_closed_form(ray_session):
    from raqc_ray.ops.vocabsim import unigram_kl_by_source

    # source a: {x:3, y:1} (N_a=4); source b: {x:1, y:3} (N_b=4);
    # corpus: {x:4, y:4} (N=8) -> P_c = (.5, .5)
    # KL(a) = .75 ln(.75/.5) + .25 ln(.25/.5); same for b by symmetry
    df = pd.DataFrame({
        "source": ["a", "a", "b", "b"],
        "text": ["x x x", "y", "x", "y y y"],
    })
    out = (unigram_kl_by_source(_ds(df, 2), "source", "text")
           .to_pandas().sort_values("source").reset_index(drop=True))
    want = 0.75 * np.log(1.5) + 0.25 * np.log(0.5)
    assert out["source"].tolist() == ["a", "b"]
    assert out["n_tokens"].tolist() == [4, 4]
    assert out["n_distinct"].tolist() == [2, 2]
    assert out["kl"].tolist() == pytest.approx([want, want], abs=1e-6)


def test_unigram_kl_identical_sources_zero(ray_session):
    from raqc_ray.ops.vocabsim import unigram_kl_by_source

    df = pd.DataFrame({
        "source": ["a", "b", "c"],
        "text": ["p q r s"] * 3,   # identical distributions
    })
    out = unigram_kl_by_source(_ds(df, 2), "source", "text").to_pandas()
    assert (out["kl"].abs() < 1e-9).all()


def test_unigram_kl_layout_invariance(ray_session):
    from raqc_ray.ops.vocabsim import unigram_kl_by_source

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(120)]
    rows = []
    for i in range(500):
        src = f"s{rng.integers(0, 4)}"
        # skew each source's token distribution differently
        lo = (int(src[1]) * 25) % 100
        toks = rng.choice(vocab[lo:lo + 40],
                          size=rng.integers(4, 20))
        rows.append((src, " ".join(toks)))
    df = pd.DataFrame(rows, columns=["source", "text"])
    outs = [(unigram_kl_by_source(_ds(df, p), "source", "text")
             .to_pandas().sort_values("source").reset_index(drop=True))
            for p in (1, 9)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0]["kl"] > 0.01).all()  # skewed sources diverge


# ------------------------------------------------- centroid distances

def test_centroid_distances_closed_form(ray_session):
    import ray.data as rd

    from raqc_ray.ops.embcov import centroid_distances

    # label 0 centered at (1, 0, 0, 0); label 1 at (0, 1, 0, 0);
    # label 2 at (1, 1, 0, 0): d(0,1)=sqrt(2), d(0,2)=1, d(1,2)=1
    rows = []
    for lab, base in ((0, [1, 0, 0, 0]), (1, [0, 1, 0, 0]),
                      (2, [1, 1, 0, 0])):
        for i in range(6):
            rows.append((lab, np.array(base, dtype=np.float64)))
    df = pd.DataFrame(rows, columns=["label", "embedding"])
    out = (centroid_distances(rd.from_pandas(df).repartition(3),
                              "label", "embedding", dim=4)
           .to_pandas().sort_values(["key_a", "key_b"])
           .reset_index(drop=True))
    assert out[["key_a", "key_b"]].values.tolist() == [
        [0, 1], [0, 2], [1, 2]]
    assert out["n_a"].tolist() == [6, 6, 6]
    assert out["dist"].tolist() == pytest.approx(
        [np.sqrt(2.0), 1.0, 1.0], abs=1e-6)


def test_centroid_distances_layout_invariance(ray_session):
    import ray.data as rd

    from raqc_ray.ops.embcov import centroid_distances

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "label": rng.integers(0, 5, 400),
        "embedding": [rng.normal(size=8) for _ in range(400)],
    })
    outs = [(centroid_distances(rd.from_pandas(df).repartition(p),
                                "label", "embedding", dim=8)
             .to_pandas().sort_values(["key_a", "key_b"])
             .reset_index(drop=True))
            for p in (1, 13)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 10  # C(5,2) pairs


# --------------------------------------------------- empty-graph kcore

def test_kcore_fully_peeled_declares_schema(ray_session):
    """A graph whose k-core is empty (or an empty pair table) must
    still return a typed (id, deg) dataset — caught by the sf0.001
    driver smoke where the co-engagement pair table is empty."""
    import ray.data as rd

    from raqc_ray.ops.kcore import kcore

    # a path graph has no 2-core
    df = pd.DataFrame({"a": [1, 2, 3], "b": [2, 3, 4]})
    out = kcore(rd.from_pandas(df), "a", "b", k=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"id", "deg"}
    # fully empty input (schema-less after the self-loop filter)
    empty = rd.from_pandas(pd.DataFrame({"a": [5], "b": [5]}))
    out2 = kcore(empty, "a", "b", k=2)
    assert out2.count() == 0
    assert set(out2.schema().names) == {"id", "deg"}


# ------------------------------------------------- shared headroom guard

def test_twap_headroom_guard(ray_session):
    """VERDICT r4 #8: the documented TWAP bound (max|v_scaled| ·
    span_us < 2^62) now raises loudly instead of wrapping."""
    from raqc_ray.ops.twap import grouped_twap

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "k": [1, 1, 1],
        "ts": [base, base + pd.Timedelta(days=400),
               base + pd.Timedelta(days=800)],
        "id": [1, 2, 3],
        # 2^35 cents x ~7e13 us span >= 2^62
        "v": [float(2 ** 35) / 100.0] * 3,
    })
    with pytest.raises(Exception, match="headroom"):
        grouped_twap(_ds(df, 1), "k", "ts", "id", "v").to_pandas()


def test_embcov_headroom_guard(ray_session):
    """covariance_matrix per-block Gram bound raises loudly when
    max|q|^2 x block rows exceeds int64 headroom."""
    import ray.data as rd

    from raqc_ray.ops.embcov import covariance_matrix

    emb = [np.full(4, 6e11, dtype=np.float64) for _ in range(8)]
    ds = rd.from_pandas(pd.DataFrame({"vec_id": np.arange(8),
                                      "embedding": emb}))
    with pytest.raises(Exception, match="headroom"):
        covariance_matrix(ds, "embedding", dim=4, scale=1).to_pandas()


# ----------------------------------------------------- source_vocab_overlap

def test_vocab_overlap_closed_form(ray_session):
    from raqc_ray.ops.vocabsim import source_vocab_overlap

    df = pd.DataFrame({
        "source": ["a", "a", "b", "c"],
        "text": ["x y z", "z w", "y z q", "only disjoint tokens"],
    })
    # vocab: a={x,y,z,w} b={y,z,q} c={only,disjoint,tokens}
    out = (source_vocab_overlap(_ds(df, 2), "source", "text")
           .to_pandas().sort_values(["src_a", "src_b"])
           .reset_index(drop=True))
    assert out[["src_a", "src_b"]].values.tolist() == [
        ["a", "b"], ["a", "c"], ["b", "c"]]
    ab = out.iloc[0]
    assert (ab["v_a"], ab["v_b"], ab["n_inter"], ab["n_union"]) == \
        (4, 3, 2, 5)
    assert ab["jaccard"] == pytest.approx(0.4)
    ac = out.iloc[1]
    assert ac["n_inter"] == 0 and ac["jaccard"] == 0.0  # zero-overlap row


def test_vocab_overlap_layout_invariance(ray_session):
    from raqc_ray.ops.vocabsim import source_vocab_overlap

    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(300)]
    rows = []
    for i in range(400):
        src = f"s{rng.integers(0, 4)}"
        toks = rng.choice(vocab, size=rng.integers(3, 25))
        rows.append((src, " ".join(toks)))
    df = pd.DataFrame(rows, columns=["source", "text"])
    outs = [(source_vocab_overlap(_ds(df, p), "source", "text")
             .to_pandas().sort_values(["src_a", "src_b"])
             .reset_index(drop=True))
            for p in (1, 11)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # exact recompute of one pair
    vocabs = {}
    for src, g in df.groupby("source"):
        vocabs[src] = set(" ".join(g["text"]).split())
    a, b = sorted(vocabs)[:2]
    ni = len(vocabs[a] & vocabs[b])
    row = outs[0][(outs[0]["src_a"] == a) & (outs[0]["src_b"] == b)]
    assert int(row["n_inter"].iloc[0]) == ni
