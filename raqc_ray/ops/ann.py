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
    out_q, out_v, out_s = [], [], []
    for qi in range(sim.shape[0]):
        out_q.extend([qi] * kk)
        out_v.extend(ids[top[qi]].tolist())
        out_s.extend(sim[qi, top[qi]].tolist())
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
