"""Grouped embedding statistics — per-key position-wise centroid of a
``list<float>`` column, quantized-exact.

Ray-Data-first plan: one ``map_batches`` combiner reduces each block to
``keys × dim`` long-format partial rows ``(key, pos, s, cnt)`` — the
embedding matrix is read zero-copy (:func:`raqc_ray.ops.dedup._emb_matrix`,
one flatten of the Arrow child buffer) and the per-key sum is one
``np.add.at`` scatter — then ONE hash ``groupby(key, pos)`` Sum moves
partials (never vectors), and a tiny finish divides.

Determinism contract (the reason this is *quantized*): float sums are
order-dependent under Ray's nondeterministic block merge order, so the
combiner sums ``floor(e * scale)`` int64 instead — integer addition is
associative, the merged sums are bit-identical across block layouts,
CPU counts and SQL engines, and the final division (int64 → float64,
same operand order as the oracle's ``CAST(SUM .. AS DOUBLE)/COUNT/scale``)
is one deterministic IEEE op.  FLOOR, not ROUND: numpy rounds
half-to-even, ANSI SQL half-away-from-zero; floor agrees at every
representable double.

Scale: partial volume is ``keys × dim × blocks`` rows, independent of
row count.  RAQC analog: none (SURVEY §2.5 is scalar stats); centroids
are the §2 LLM-pipeline surface (class prototypes, IVF coarse
quantizer seeds, per-source embedding drift).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_centroid(ds, key: str, emb_col: str, dim: int,
                     scale: int = 10_000_000):
    """Dataset ``(key, pos, centroid, n)`` — position-wise mean of the
    quantized embeddings per key; ``pos`` is 1-based (SQL
    ``generate_subscripts`` convention)."""
    from .dedup import _emb_matrix

    def partials(b: pa.Table) -> pd.DataFrame:
        emb = _emb_matrix(b[emb_col], dim)
        q = np.floor(emb * scale).astype(np.int64)
        keys = b[key].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros((len(uk), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pd.DataFrame({
            key: np.repeat(uk, dim),
            "pos": np.tile(np.arange(1, dim + 1, dtype=np.int64), len(uk)),
            "s": sums.ravel(),
            "cnt": np.repeat(cnt, dim),
        })

    from ray.data.aggregate import Sum

    summed = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby([key, "pos"])
              .aggregate(Sum("s", alias_name="s"),
                         Sum("cnt", alias_name="n")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(dtype=np.float64)
        n = df["n"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            key: df[key],
            "pos": df["pos"].astype("int64"),
            "centroid": s / n / scale,
            "n": df["n"].astype("int64"),
        })

    return summed.map_batches(finish, batch_format="pandas")


def vq_assign(ds, id_col: str, emb_col: str, dim: int,
              labels: np.ndarray, codebook: np.ndarray,
              out_col: str = "vq_label"):
    """Nearest-centroid assignment (the vector-quantization / k-means
    E-step): each embedding gets the label of its closest codebook row
    by squared L2, ties to the smallest label.

    ``codebook`` is a tiny (k, dim) float64 matrix broadcast into every
    task via the map_batches closure (ray.put once under the hood —
    never re-shipped per batch); per batch the distances are ONE
    ``‖e‖² − 2·E@Cᵀ + ‖c‖²`` matmul over the zero-copy embedding
    matrix.  ``labels`` must be sorted ascending so ``argmin``'s
    first-hit rule implements the smallest-label tiebreak."""
    from .dedup import _emb_matrix

    order = np.argsort(labels, kind="stable")
    labels = np.asarray(labels, dtype=np.int64)[order]
    cb = np.ascontiguousarray(codebook, dtype=np.float64)[order]
    c2 = (cb * cb).sum(axis=1)

    def assign(b: pa.Table) -> pd.DataFrame:
        emb = _emb_matrix(b[emb_col], dim)
        d2 = ((emb * emb).sum(axis=1, keepdims=True)
              - 2.0 * emb @ cb.T + c2)
        idx = np.argmin(d2, axis=1)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(zero_copy_only=False),
            out_col: labels[idx],
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit(ds, id_col: str, emb_col: str, dim: int, k: int,
               n_iter: int = 20, scale: int = 10_000_000):
    """Distributed Lloyd k-means over an embedding column — the full
    iterative loop built from this module's two primitives: E-step =
    :func:`vq_assign` (broadcast codebook, one matmul per batch),
    M-step = :func:`grouped_centroid` (quantized-exact int64 sums).

    Because the M-step centroids are QUANTIZED-exact (bit-identical
    across block layouts) and the E-step argmin is a deterministic
    function of them, the whole fit is reproducible across layouts and
    CPU counts — convergence is detected by exact centroid equality,
    not a float tolerance.  Initialization: the k rows with the
    smallest ``id_col`` values (deterministic; pass a pre-shuffled id
    if the head of the table is degenerate).

    Each iteration is two streaming passes over the (materialized)
    input; empty clusters keep their previous centroid.  Returns
    ``(assign_ds, labels, codebook)`` — the final per-row cluster
    Dataset ``(id_col, vq_label)`` plus the fitted codebook."""
    from .dedup import _emb_matrix

    ds = ds.materialize()
    head = (ds.sort(id_col).limit(k)
            .select_columns([id_col, emb_col]).to_pandas())
    import pyarrow as _pa

    init = _emb_matrix(_pa.table(head)[emb_col], dim)
    labels = np.arange(k, dtype=np.int64)
    codebook = np.ascontiguousarray(init, dtype=np.float64)

    for _ in range(n_iter):
        # E+M fused per block: assign inside one map_batches carrying
        # the embedding alongside the label (no join back)
        def tag(b, _cb=codebook, _lb=labels):
            emb = _emb_matrix(b[emb_col], dim)
            d2 = ((emb * emb).sum(axis=1, keepdims=True)
                  - 2.0 * emb @ _cb.T + (_cb * _cb).sum(axis=1))
            idx = np.argmin(d2, axis=1)
            return pd.DataFrame({"vq_label": _lb[idx],
                                 emb_col: list(np.asarray(
                                     emb, dtype=np.float32))})

        tagged = ds.map_batches(tag, batch_format="pyarrow")
        cent = grouped_centroid(tagged, "vq_label", emb_col, dim,
                                scale=scale).to_pandas()
        new_cb = codebook.copy()
        for lab, g in cent.groupby("vq_label"):
            g = g.sort_values("pos")
            new_cb[int(lab)] = g["centroid"].to_numpy(dtype=np.float64)
        if np.array_equal(new_cb, codebook):
            break
        codebook = np.ascontiguousarray(new_cb)

    assign = vq_assign(ds, id_col, emb_col, dim, labels, codebook)
    return assign, labels, codebook


def grouped_norm_stats(ds, key: str, emb_col: str, dim: int,
                       scale: int = 1_000_000):
    """Per-key L2-norm statistics of an embedding column, quantized-
    exact (same FLOOR-quantization discipline as
    :func:`grouped_centroid`): each row contributes
    ``floor(||e||₂ · scale)`` int64, so the per-key sums are
    associative, layout-invariant and bit-identical to a SQL
    ``SUM(CAST(FLOOR(sqrt(list_sum(list_transform(e, x → x²)))·scale)
    AS BIGINT))`` oracle; the mean is one IEEE division at the end.

    One block combiner (zero-copy Arrow flatten → vectorized-across-rows
    but SEQUENTIAL-across-positions sum of squares, matching the SQL
    ``list_sum`` left-to-right evaluation order exactly — numpy's
    pairwise ``sum(axis=1)`` would differ in the last ulp and flip a
    FLOOR at quantization boundaries) + ONE keys-sized hash
    aggregation.  Columns: ``(key, n, sum_norm_q, avg_norm)``."""
    from ray.data.aggregate import Sum

    from .dedup import _emb_matrix

    def block_partials(batch: pa.Table) -> pd.DataFrame:
        emb = _emb_matrix(batch[emb_col], dim)
        ss = np.zeros(len(emb), dtype=np.float64)
        for j in range(emb.shape[1]):  # sequential like SQL list_sum
            ss += emb[:, j] * emb[:, j]
        norms = np.sqrt(ss)
        q = np.floor(norms * scale).astype(np.int64)
        d = pd.DataFrame({
            key: batch[key].to_numpy(zero_copy_only=False),
            "__q": q,
            "__n": np.ones(len(q), dtype=np.int64),
        })
        return d.groupby(key, sort=False, as_index=False).sum()

    agg = (ds.map_batches(block_partials, batch_format="pyarrow")
           .groupby(key)
           .aggregate(Sum("__q", alias_name="sum_norm_q"),
                      Sum("__n", alias_name="n")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df["sum_norm_q"].to_numpy(dtype=np.int64)
        n = df["n"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            key: df[key],
            "n": n,
            "sum_norm_q": s,
            "avg_norm": np.round(s.astype(np.float64) / n / scale, 6),
        })

    return agg.map_batches(finish, batch_format="pandas")
