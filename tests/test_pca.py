"""PCA projection + PCA-coarse/exact-rerank ANN (ops/embcov.pca_model /
pca_project, ops/ann.pca_rerank_topk).

Gates: model reconstruction (full-rank projection reproduces the
centered data; per-component variance equals the eigenvalue), rerank
recall >= 0.9 on an anisotropic fixture, pool=corpus == brute-force
exact, and every returned score being the exact full-space cosine.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raqc_ray.ops.ann import brute_topk, pca_rerank_topk
from raqc_ray.ops.embcov import pca_model, pca_project

DIM = 16


def _emb_df(n=600, seed=2):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions (realistic embeddings)
    scales = np.concatenate([np.array([5.0, 3.0, 2.0, 1.5]),
                             np.full(DIM - 4, 0.3)])
    basis = np.linalg.qr(rng.normal(size=(DIM, DIM)))[0]
    emb = (rng.normal(size=(n, DIM)) * scales) @ basis.T + 0.5
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(emb.astype(np.float64))})


@pytest.fixture(scope="module")
def emb(ray_session):
    return _emb_df()


def test_model_reconstruction_and_eigvals(emb):
    ds = rd.from_pandas(emb).repartition(5)
    mean, comps, eig = pca_model(ds, "embedding", DIM, k=DIM)
    # full-rank orthonormal basis → projection reproduces centered data
    assert np.allclose(comps @ comps.T, np.eye(DIM), atol=1e-9)
    proj = pca_project(ds, mean, comps).to_pandas().sort_values("vec_id")
    pm = np.stack(proj["proj"].to_list())
    raw = np.stack(emb.sort_values("vec_id")["embedding"].to_list())
    assert np.allclose(pm @ comps, raw - mean, atol=1e-3)  # quantized mean
    # per-component variance equals the eigenvalue (population)
    var = pm.var(axis=0)
    assert np.allclose(var, eig, rtol=1e-3, atol=1e-4)
    # eigenvalues descend
    assert (np.diff(eig) <= 1e-12).all()


def test_rerank_recall_and_exact_scores(emb):
    ds = rd.from_pandas(emb).repartition(7)
    queries = np.stack(emb["embedding"].iloc[:6].to_list())
    exact = brute_topk(ds, queries, k=5).to_pandas()
    ap = pca_rerank_topk(ds, queries, k=5, k_components=6,
                         pool=40).to_pandas()
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = ap.groupby("query_id")["vec_id"].apply(set)
    rec = np.mean([len(e[q] & a[q]) / len(e[q]) for q in e.index])
    assert rec >= 0.9
    # every returned score is the exact full-space cosine
    m = ap.merge(exact, on=["query_id", "vec_id"], suffixes=("_a", "_e"))
    assert (m["score_a"] - m["score_e"]).abs().max() == 0.0


def test_pool_equals_corpus_is_exact(emb):
    ds = rd.from_pandas(emb).repartition(3)
    queries = np.stack(emb["embedding"].iloc[:4].to_list())
    exact = brute_topk(ds, queries, k=5).to_pandas()
    full = pca_rerank_topk(ds, queries, k=5, k_components=6,
                           pool=len(emb)).to_pandas()

    def canon(d):
        return (d.sort_values(["query_id", "rank"])
                .reset_index(drop=True)[["query_id", "vec_id",
                                         "score", "rank"]])

    pd.testing.assert_frame_equal(canon(full), canon(exact))
