"""Exact quantized covariance / second-moment (Gram) matrix over an
embedding column — the distributed dense-linear-algebra accumulation
every representation-quality audit needs (feature collapse detection,
whitening statistics, PCA input) expressed Ray-Data-first.

Plan (the `grouped_centroid` quantized-exact discipline extended to
second moments): each block computes the int64 Gram partial
``Q.T @ Q`` of its quantized vectors ``q = floor(e * scale)`` plus the
per-position sums and the row count — ONE numpy matmul per block, no
per-row Python.  Partials are emitted as long ``(i, j, s)`` rows
(``i <= j``; constant ``dim*(dim+3)/2 + 1`` rows per block — nothing
row-count-sized ever shuffles), reduced by a native ``groupby.Sum``
(Python-int accumulation → exact and order-independent), and finished
on the driver into exact integer covariance numerators::

    cov_num[i, j] = n * sum_qq[i, j] - s[i] * s[j]

so ``cov[i, j] = cov_num / (n^2 * scale^2)`` (population) is
bit-identical across block layouts.

Overflow discipline: ``n``, ``sum_qq`` and the position sums stay
int64 (``sum_qq <= n * q_max²`` — with ``scale=1e4`` and unit-variance
data that is int64-safe to ~10^10 rows), but the numerator
``n*sum_qq - s_i*s_j`` grows as n² and leaves int64 around n ≈ 10^5,
so ``cov_num`` is emitted as an exact DECIMAL STRING computed in
arbitrary-precision Python ints (the `ops/histdrift` l1_num pattern;
the SQL oracle mirrors it with HUGEINT → VARCHAR).  A 1M-row stress
exercises the beyond-int64 branch.

Sentinel encoding of the sums inside the same reduce: position sums
ride as ``(i, 0, s_i)`` rows and the count as ``(0, 0, n)`` (real
positions are 1-based, SQL ``generate_subscripts`` convention), so
ONE shuffle of ≤ dim*(dim+3)/2 + 1 keys carries everything.

Gates: closed-form unit test on a tiny known matrix + layout
invariance (`test_ops_round4t`), and the full DuckDB double-unnest
self-join oracle `q183_embcov_embeddings`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _emb_matrix


def covariance_matrix(ds, emb_col: str, dim: int, scale: int = 10_000):
    """Dataset of ``(i, j, n, sum_qq, cov_num)`` rows for the upper
    triangle ``1 <= i <= j <= dim`` (1-based positions); exact and
    layout-deterministic — int64 except ``cov_num``, an exact decimal
    string (can exceed int64; see module overflow discipline)."""
    iu0, iu1 = np.triu_indices(dim)
    ii = (iu0 + 1).astype(np.int64)
    jj = (iu1 + 1).astype(np.int64)

    def partials(b: pa.Table) -> pd.DataFrame:
        from .vhist import assert_headroom

        emb = _emb_matrix(b[emb_col], dim)
        q = np.floor(emb * scale).astype(np.int64)
        if q.size:
            # documented per-block bound made loud: Σ_rows q_i·q_j ≤
            # max|q|² · block_rows (the global re-sum is Sum over
            # int64 partials — adversarial scales must rescale)
            assert_headroom(int(np.abs(q).max()) ** 2, q.shape[0],
                            "covariance_matrix")
        gram = q.T @ q  # (dim, dim) int64, one matmul per block
        s = q.sum(axis=0, dtype=np.int64)
        i = np.concatenate([ii, np.arange(1, dim + 1, dtype=np.int64),
                            np.zeros(1, dtype=np.int64)])
        j = np.concatenate([jj, np.zeros(dim, dtype=np.int64),
                            np.zeros(1, dtype=np.int64)])
        v = np.concatenate([gram[iu0, iu1], s,
                            np.asarray([q.shape[0]], dtype=np.int64)])
        return pd.DataFrame({"i": i, "j": j, "s": v})

    from ray.data.aggregate import Sum

    summed = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["i", "j"])
              .aggregate(Sum("s", alias_name="s")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # driver-side: <= dim*(dim+3)/2 + 1 rows by construction
        i = df["i"].to_numpy(dtype=np.int64)
        j = df["j"].to_numpy(dtype=np.int64)
        s = df["s"].to_numpy(dtype=np.int64)
        n = int(s[(i == 0) & (j == 0)][0])
        sums = {int(a): int(b)
                for a, b in zip(i[(j == 0) & (i > 0)],
                                s[(j == 0) & (i > 0)])}
        tri = (j > 0)
        it, jt, st = i[tri], j[tri], s[tri]
        cov = [str(n * int(sq) - sums[int(a)] * sums[int(b)])
               for a, b, sq in zip(it, jt, st)]  # exact Python ints
        return pd.DataFrame({"i": it, "j": jt,
                             "n": np.int64(n), "sum_qq": st,
                             "cov_num": cov})

    return summed.repartition(1).map_batches(finish, batch_format="pandas")


def grouped_covariance_matrix(ds, key: str, emb_col: str, dim: int,
                              scale: int = 10_000):
    """Per-key exact covariance matrix — the per-class variant of
    :func:`covariance_matrix` (does class X's representation collapse
    while class Y's spreads?).  Same plan with the key carried through:
    per block, one Gram matmul PER KEY PRESENT (keys per block, not
    rows), long ``(key, i, j, s)`` partials with the sums/count
    sentinel rows, native groupby-Sum over (key, i, j), and a per-key
    finish over histogram-sized rows (dim*(dim+3)/2 + dim + 1 per
    key — the `quantile_exact` map_groups regime, never the input).

    Returns ``(key, i, j, n, sum_qq, cov_num)`` rows, exact int64."""
    iu0, iu1 = np.triu_indices(dim)
    ii = (iu0 + 1).astype(np.int64)
    jj = (iu1 + 1).astype(np.int64)
    pos = np.arange(1, dim + 1, dtype=np.int64)
    block_i = np.concatenate([ii, pos, np.zeros(1, dtype=np.int64)])
    block_j = np.concatenate([jj, np.zeros(dim + 1, dtype=np.int64)])
    rows_per_key = len(block_i)

    def partials(b: pa.Table) -> pd.DataFrame:
        emb = _emb_matrix(b[emb_col], dim)
        q = np.floor(emb * scale).astype(np.int64)
        keys = b[key].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        frames = []
        for g, kv in enumerate(uk):
            qg = q[inv == g]
            gram = qg.T @ qg
            v = np.concatenate([gram[iu0, iu1],
                                qg.sum(axis=0, dtype=np.int64),
                                np.asarray([qg.shape[0]],
                                           dtype=np.int64)])
            frames.append(pd.DataFrame({
                key: np.repeat(np.asarray([kv]), rows_per_key),
                "i": block_i, "j": block_j, "s": v}))
        return pd.concat(frames, ignore_index=True)

    from ray.data.aggregate import Sum

    summed = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby([key, "i", "j"])
              .aggregate(Sum("s", alias_name="s")))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        i = g["i"].to_numpy(dtype=np.int64)
        j = g["j"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        n = int(s[(i == 0) & (j == 0)][0])
        sums = {int(a): int(b)
                for a, b in zip(i[(j == 0) & (i > 0)],
                                s[(j == 0) & (i > 0)])}
        tri = (j > 0)
        it, jt, st = i[tri], j[tri], s[tri]
        cov = [str(n * int(sq) - sums[int(a)] * sums[int(b)])
               for a, b, sq in zip(it, jt, st)]  # exact Python ints
        return pd.DataFrame({key: g[key].iloc[0],
                             "i": it, "j": jt,
                             "n": np.int64(n), "sum_qq": st,
                             "cov_num": cov})

    return summed.groupby(key).map_groups(finish, batch_format="pandas")


def pca_top(ds, emb_col: str, dim: int, k: int = 4,
            scale: int = 10_000) -> pd.DataFrame:
    """Top-k PCA of the embedding corpus — the representation-collapse
    audit (a healthy embedding space spreads variance; a collapsed one
    concentrates it in a few directions).

    Distribution shape: ALL the data-sized work is
    `covariance_matrix` (one matmul per block, constant-size
    shuffle); the eigendecomposition runs on the driver over the
    dim x dim matrix — dim² floats, independent of corpus size.
    Because the covariance numerators are exact integers, the input
    matrix (and therefore `eigh`, a deterministic LAPACK call on it)
    is bit-identical across block layouts.

    Returns a pandas DataFrame of k*dim long rows
    ``(comp, pos, loading, eigval, evr)``: 1-based component rank by
    descending eigenvalue, 1-based position, the eigenvector loading
    (sign-fixed: the largest-|loading| coordinate is positive),
    eigenvalue in embedding units², and the explained-variance ratio
    ``eigval / trace``."""
    cov_rows = covariance_matrix(ds, emb_col, dim, scale=scale
                                 ).to_pandas()
    n = int(cov_rows["n"].iloc[0])
    cov = np.zeros((dim, dim), dtype=np.float64)
    i = cov_rows["i"].to_numpy(dtype=np.int64) - 1
    j = cov_rows["j"].to_numpy(dtype=np.int64) - 1
    den = float(n) * float(n) * float(scale) * float(scale)
    # decimal-string numerators (exact beyond int64) -> float here
    v = np.asarray([float(int(x)) for x in cov_rows["cov_num"]],
                   dtype=np.float64) / den
    cov[i, j] = v
    cov[j, i] = v
    w, vecs = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    trace = float(np.trace(cov))
    out = []
    for rank, idx in enumerate(order, start=1):
        vec = vecs[:, idx]
        if vec[np.argmax(np.abs(vec))] < 0:
            vec = -vec
        for pos in range(dim):
            out.append((rank, pos + 1, float(vec[pos]),
                        float(w[idx]),
                        float(w[idx]) / trace if trace else 0.0))
    return pd.DataFrame(out, columns=["comp", "pos", "loading",
                                      "eigval", "evr"])


# ------------------------------------------------------------- projection


def pca_model(ds, emb_col: str, dim: int, k: int = 8,
              scale: int = 10_000):
    """Fit a PCA model for PROJECTION: returns
    ``(mean, components, eigvals)`` with ``mean`` the (dim,) corpus
    mean (exact int64 sums / (n*scale), same quantized discipline as
    the covariance), ``components`` the (k, dim) sign-fixed top-k
    eigenvector matrix from :func:`pca_top`, ``eigvals`` (k,).

    Fit is two data passes (mean partials + the covariance partials),
    both constant-size shuffles; everything else is driver-side dim²
    work — corpus-size-independent."""
    from ray.data.aggregate import Sum

    rows = pca_top(ds, emb_col, dim, k=k, scale=scale)
    comps = np.zeros((k, dim), dtype=np.float64)
    eig = np.zeros(k, dtype=np.float64)
    c = rows["comp"].to_numpy(np.int64) - 1
    p = rows["pos"].to_numpy(np.int64) - 1
    comps[c, p] = rows["loading"].to_numpy(np.float64)
    eig[c[p == 0]] = rows["eigval"].to_numpy(np.float64)[p == 0]

    def mean_partials(b: pa.Table) -> pd.DataFrame:
        emb = _emb_matrix(b[emb_col], dim)
        q = np.floor(emb * scale).astype(np.int64)
        return pd.DataFrame({
            "i": np.arange(dim + 1, dtype=np.int64),
            "s": np.concatenate([np.asarray([q.shape[0]], dtype=np.int64),
                                 q.sum(axis=0, dtype=np.int64)])})

    m = (ds.map_batches(mean_partials, batch_format="pyarrow")
         .groupby("i").aggregate(Sum("s", alias_name="s"))).to_pandas()
    m = m.sort_values("i").reset_index(drop=True)
    n = int(m["s"].iloc[0])
    mean = m["s"].to_numpy(np.float64)[1:] / (float(n) * float(scale))
    return mean, comps, eig


def pca_project(ds, mean: np.ndarray, components: np.ndarray,
                emb_col: str = "embedding", id_col: str = "vec_id",
                out_col: str = "proj"):
    """Project every embedding onto the fitted components:
    ``proj = (e - mean) @ components.T`` — one broadcast (``ray.put``
    of the (k+1) × dim model, once) and one matmul per block; output
    is ``(id_col, out_col)`` with ``out_col`` a fixed-size-list<double>
    of length k.  The dim→k reduction that feeds LSH / coarse ANN."""
    import ray

    from .dedup import _emb_matrix as _em

    dim = components.shape[1]
    kk = components.shape[0]
    ref = ray.put((np.ascontiguousarray(mean, dtype=np.float64),
                   np.ascontiguousarray(components.T, dtype=np.float64)))

    def proj(b: pa.Table) -> pa.Table:
        mn, vt = ray.get(ref)
        emb = _em(b[emb_col], dim)
        pm = (emb - mn) @ vt  # (batch, k)
        return pa.table({
            id_col: b[id_col],
            out_col: pa.FixedSizeListArray.from_arrays(
                pa.array(pm.ravel(), pa.float64()), kk),
        })

    return ds.map_batches(proj, batch_format="pyarrow")


def centroid_distances(ds, key: str, emb_col: str, dim: int,
                       scale: int = 10_000, round_to: int = 6):
    """Pairwise L2 distances between per-key QUANTIZED centroids —
    the inter-class separation matrix (did two label clusters
    collapse into each other after a bad re-embed?).  One row per
    unordered key pair ``(key_a < key_b)``:
    ``(key_a, key_b, n_a, n_b, dist)`` with
    ``dist = sqrt(Σ_pos (s_a/n_a − s_b/n_b)²) / scale`` over the
    exact int64 sums ``s = Σ floor(emb·scale)`` — the float epilogue
    mirrors the SQL oracle expression shape (round-``round_to``).

    Plan: per block, ONE factorize + ``np.add.at`` gives every
    present key's sum vector (keys × dim int64 — constant-size
    partials); the partial stream (blocks × keys × dim rows) is
    output-sized, so the re-sum and the S×S pairwise finish run on
    the driver.  Keys are driver-small by contract (labels/classes —
    the `grouped_covariance_matrix` regime).  int64 headroom guarded
    per block via ``vhist.assert_headroom``."""
    import ray.data as rd

    from .vhist import assert_headroom

    def partials(b: pa.Table) -> pd.DataFrame:
        emb = _emb_matrix(b[emb_col], dim)
        q = np.floor(emb * scale).astype(np.int64)
        if q.size:
            assert_headroom(int(np.abs(q).max()), q.shape[0],
                            "centroid_distances")
        keys = b[key].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys)
        s = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(s, codes, q)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame({
            key: np.repeat(np.asarray(uniq), dim),
            "pos": np.tile(np.arange(1, dim + 1, dtype=np.int64),
                           len(uniq)),
            "s": s.ravel(),
            "n": np.repeat(n, dim),
        })

    part = (ds.map_batches(partials, batch_format="pyarrow")
            .to_pandas())  # blocks × keys × dim — output-sized
    if len(part) == 0:
        return rd.from_pandas(pd.DataFrame({
            "key_a": pd.Series(dtype="object"),
            "key_b": pd.Series(dtype="object"),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "dist": pd.Series(dtype="float64")}))
    g = (part.groupby([key, "pos"], as_index=False)
         .agg(s=("s", "sum"), n=("n", "sum")))
    labels = sorted(g[key].unique())
    mats = {}
    ns = {}
    for lab in labels:
        sub = g[g[key] == lab].sort_values("pos")
        mats[lab] = sub["s"].to_numpy(dtype=np.float64)
        ns[lab] = int(sub["n"].iloc[0])
    rows = []
    for i, a in enumerate(labels):
        for b_ in labels[i + 1:]:
            d = mats[a] / ns[a] - mats[b_] / ns[b_]
            dist = float(np.sqrt((d * d).sum()) / scale)
            rows.append((a, b_, ns[a], ns[b_],
                         np.round(dist, round_to)))
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["key_a", "key_b", "n_a", "n_b", "dist"]))
