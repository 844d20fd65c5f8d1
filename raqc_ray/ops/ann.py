"""Approximate-nearest-neighbor search over an embedding column.

Two paths, same result schema (query_id, vec_id, score, rank):

- ``brute_topk`` — the exact baseline: the query matrix is broadcast once
  (``ray.put``), every batch does one numpy matmul against it and emits
  its local top-k per query (partial top-k = the combiner), and a tiny
  groupby(query_id) merge keeps the global top-k.  Work per batch is
  O(batch × nq × dim) vectorized; the shuffle carries nq × k rows per
  block, never embeddings.
- ``ivf_topk`` — the scale path: a k-means-lite coarse quantizer (trained
  driver-side on a sample, seeded) partitions vectors into nlist cells;
  queries scan only their ``nprobe`` nearest cells.  Recall < 1 by design;
  the dial is (nlist, nprobe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _partial_topk(batch: pa.Table, qref, k: int) -> pa.Table:
    from .dedup import _emb_matrix

    q = ray.get(qref)  # (nq, dim) normalized query matrix, broadcast once
    emb = _normalize(_emb_matrix(batch["embedding"], q.shape[1]))
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    sim = q @ emb.T  # (nq, batch)
    kk = min(k, sim.shape[1])
    top = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
    # vectorized emission (no per-query Python loop — it dominates at
    # large nq): (nq, kk) index grids raveled once
    out_q = np.repeat(np.arange(sim.shape[0], dtype=np.int64), kk)
    out_v = ids[top].ravel().astype(np.int64, copy=False)
    out_s = np.take_along_axis(sim, top, axis=1).ravel()
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        }
    )


def _merge_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    g["score"] = g["score"].round(6)
    return g


def brute_topk(emb_ds, queries: np.ndarray, k: int = 10):
    """Exact cosine top-k of each query row against the dataset."""
    qref = ray.put(_normalize(np.asarray(queries, dtype=np.float64)))
    partials = emb_ds.map_batches(
        lambda b: _partial_topk(b, qref, k), batch_format="pyarrow"
    )
    return partials.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas"
    )


# ---------------------------------------------------------------- IVF path


def train_coarse_quantizer(sample: np.ndarray, nlist: int = 16, iters: int = 10,
                           seed: int = 3) -> np.ndarray:
    """k-means-lite on a driver-side sample (seeded, deterministic)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    cents = sample[rng.choice(len(sample), size=min(nlist, len(sample)),
                              replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10, nlist: int = 16,
             nprobe: int = 4, train_sample: np.ndarray | None = None):
    """IVF ANN: scan only the nprobe cells nearest each query.

    The centroid table is tiny and broadcast; cell assignment happens
    inside the same batch pass as the scan (no extra shuffle at all —
    each batch scores only rows whose cell is probed by some query)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    if train_sample is None:
        # Uniform random sample across ALL blocks (seeded, deterministic
        # given the input), not limit() — first-blocks training skews the
        # quantizer on clustered/sorted tables.  The sample pass streams
        # and ships only the sampled rows.
        n = emb_ds.count()
        frac = min(1.0, 4096.0 / max(n, 1))
        sampled = (emb_ds.random_sample(frac, seed=3) if frac < 1.0
                   else emb_ds)
        train_sample = np.stack(
            sampled.to_pandas()["embedding"].to_list()
        )
    cents = train_coarse_quantizer(train_sample, nlist=nlist)
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((q, cents, probe))

    def scan(batch: pa.Table) -> pa.Table:
        from .dedup import _emb_matrix

        qm, cm, pr = ray.get(ref)
        emb = _normalize(_emb_matrix(batch["embedding"], qm.shape[1]))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        cells = np.argmax(emb @ cm.T, axis=1)  # (batch,)
        out_q, out_v, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cells, pr[qi])
            if not mask.any():
                continue
            sim = emb[mask] @ qm[qi]
            sel_ids = ids[mask]
            kk = min(k, len(sim))
            top = np.argpartition(-sim, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_v.extend(sel_ids[top].tolist())
            out_s.extend(sim[top].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_v, pa.int64()),
             "score": pa.array(out_s, pa.float64())}
        )

    partials = emb_ds.map_batches(scan, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas"
    )


# ------------------------------------------------------ PCA + re-rank path


def pca_fit_basis(emb_ds, dim: int, k_components: int = 8) -> np.ndarray:
    """Fit the (k_components, dim) uncentered orthonormal coarse basis
    for :func:`pca_rerank_topk` over ℓ2-NORMALIZED embeddings: the mean
    direction first, then the top covariance eigenvectors Gram-Schmidt'd
    against it.  Fit ONCE per corpus (two constant-shuffle passes) and
    reuse across query batches — refitting per search is where a PCA-ANN
    stack loses to brute force at small query counts."""
    from .embcov import pca_model

    def norm_block(b: pa.Table) -> pa.Table:
        from .dedup import _emb_matrix

        emb = _normalize(_emb_matrix(b["embedding"], dim))
        return pa.table({
            "vec_id": b["vec_id"],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float64()), dim)})

    nds = emb_ds.map_batches(norm_block, batch_format="pyarrow")
    mean, comps, _ = pca_model(nds, "embedding", dim,
                               k=max(1, k_components - 1))
    rows = []
    mn = np.linalg.norm(mean)
    if mn > 1e-12:
        rows.append(mean / mn)
    for v in comps:
        for u in rows:
            v = v - (v @ u) * u
        nv = np.linalg.norm(v)
        if nv > 1e-9:
            rows.append(v / nv)
    return np.stack(rows[:k_components])


def pca_rerank_topk(emb_ds, queries: np.ndarray, k: int = 10,
                    k_components: int = 8, pool: int | None = None,
                    basis: np.ndarray | None = None):
    """Two-stage ANN: PCA coarse scan + exact full-space re-rank — the
    third point on the exact↔approx dial (q20 brute / q21 IVF / this).

    Stage 1 (coarse): embeddings are ℓ2-normalized and projected onto
    an UNCENTERED orthonormal basis A = [mean-direction ⊥ top-(k-1)
    covariance eigenvectors] (the rank-1 mean correction makes
    ``(q@Aᵀ)·(e@Aᵀ) = q A Aᵀ e ≈ q·e`` — centered projections would
    inject a per-candidate ``-m·e`` bias into the ranking).  Each block
    emits its local top-``pool`` per query on the k-dim dot — a
    (dim→k)-cheaper matmul; only (nq × pool) id rows ever move.

    Stage 2 (exact): the candidate-id set (nq × pool, driver-small) is
    broadcast; one more streaming pass scores ONLY candidate rows with
    the exact full-dim cosine and keeps the global top-k.

    Recall < 1 by design (dial = k_components / pool); the re-rank
    makes every returned score exact.  Same result schema as
    ``brute_topk``: (query_id, vec_id, score, rank).

    ``basis``: pass a pre-fit :func:`pca_fit_basis` result to amortize
    the two fit passes across query batches — the fit-once/search-many
    contract.  With ``basis=None`` the fit runs inline (fine for large
    query batches; at small nq brute force wins, see BASELINE.md)."""
    from .dedup import _emb_matrix

    q = _normalize(np.asarray(queries, dtype=np.float64))
    dim = q.shape[1]
    if pool is None:
        pool = max(5 * k, 20)

    if basis is None:
        # inline fit: normalize once, materialize, reuse for the fit's
        # two passes plus coarse + exact (coarse/exact re-normalize —
        # idempotent here)
        def norm_block(b: pa.Table) -> pa.Table:
            emb = _normalize(_emb_matrix(b["embedding"], dim))
            return pa.table({
                "vec_id": b["vec_id"],
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.ravel(), pa.float64()), dim)})

        src = emb_ds.map_batches(norm_block, batch_format="pyarrow"
                                 ).materialize()
        basis = pca_fit_basis(src, dim, k_components)  # (kc, dim)
    else:
        # prefit basis (fit-once/search-many): stream the raw dataset —
        # no normalize-materialize copy of the corpus
        src = emb_ds
    basis = np.ascontiguousarray(basis, dtype=np.float64)

    qproj = q @ basis.T  # (nq, kc)
    bref = ray.put((qproj, basis.T))

    def coarse(b: pa.Table) -> pa.Table:
        qp, bt = ray.get(bref)
        emb = _normalize(_emb_matrix(b["embedding"], dim))
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        sim = qp @ (emb @ bt).T  # (nq, batch) in k-dim space
        kk = min(pool, sim.shape[1])
        top = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        out_q = np.repeat(np.arange(sim.shape[0], dtype=np.int64), kk)
        out_v = ids[top].ravel().astype(np.int64, copy=False)
        out_s = np.take_along_axis(sim, top, axis=1).ravel()
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    cand = (src.map_batches(coarse, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(lambda g: _merge_topk(g, pool),
                        batch_format="pandas")).to_pandas()
    # (query_id, vec_id) candidate pairs — nq × pool, driver-small;
    # membership as a dense (nq, n_cand_ids) bit matrix over the sorted
    # unique candidate ids so the scoring pass is loop-free
    cand_ids = np.unique(cand["vec_id"].to_numpy(np.int64))
    member = np.zeros((q.shape[0], len(cand_ids)), dtype=bool)
    member[cand["query_id"].to_numpy(np.int64),
           np.searchsorted(cand_ids,
                           cand["vec_id"].to_numpy(np.int64))] = True
    pref = ray.put((q, cand_ids, member))

    def exact(b: pa.Table) -> pa.Table:
        qm, cids, mem = ray.get(pref)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cids, ids)
        pos[pos >= len(cids)] = 0
        keep = cids[pos] == ids
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        emb = _normalize(_emb_matrix(b["embedding"], qm.shape[1])[keep])
        ids = ids[keep]
        mask = mem[:, pos[keep]]  # (nq, kept) candidate membership
        qi, ci = np.nonzero(mask)
        if len(qi) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        sim = qm @ emb.T  # (nq, kept) exact full-dim cosine
        return pa.table({"query_id": pa.array(qi.astype(np.int64),
                                              pa.int64()),
                         "vec_id": pa.array(ids[ci].astype(np.int64),
                                            pa.int64()),
                         "score": pa.array(sim[qi, ci], pa.float64())})

    return (src.map_batches(exact, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(lambda g: _merge_topk(g, k),
                        batch_format="pandas"))
