"""Deduplication operators for large-scale training-data pipelines.

All shapes follow the same scale recipe as the engine's near-dup check
(checks/neardup.py): vectorized per-batch signature extraction →
hash-partitioned groupby on a bucket key → bounded in-group scan →
canonical-pair dedup.  Shuffles only move narrow signature rows, never
document text.

Determinism: no reliance on Python's per-process string hash — shingle
hashing uses the same vectorized rolling/Karp-Rabin arithmetic everywhere
(workers agree across processes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _token_hash(tok: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
    )


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant (public)


def _shingle_hashes(tok_hashes: np.ndarray, k: int) -> np.ndarray:
    """Deterministic hashes of k-token shingles from per-token hashes —
    fully vectorized (position-sensitive multiply-rotate mix)."""
    n = len(tok_hashes)
    if n < k:
        acc = np.uint64(0)
        for j, h in enumerate(tok_hashes):
            acc ^= (h * _SHINGLE_MIX) << np.uint64(j % 8)
        return np.array([acc], dtype=np.uint64)
    out = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        seg = tok_hashes[j : n - k + 1 + j]
        out ^= (seg * _SHINGLE_MIX) << np.uint64(j)  # position-dependent
    return np.unique(out)


class MinHasher:
    """Per-actor state: the (a, b) permutation parameters (seeded)."""

    def __init__(self, num_perm: int = 64, k_shingle: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        # odd multipliers avoid degenerate permutations mod 2^64
        self.a = (rng.integers(1, 1 << 61, num_perm, dtype=np.uint64) << np.uint64(1)
                  ) | np.uint64(1)
        self.b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k_shingle

    def signature(self, text: str, vocab: dict[str, int] | None = None
                  ) -> np.ndarray:
        toks = (text or "").split()
        if vocab is None:
            th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64,
                             count=len(toks))
        else:
            th = np.fromiter((vocab[t] for t in toks), dtype=np.uint64,
                             count=len(toks))
        sh = _shingle_hashes(th, self.k)
        # (num_perm, n_shingles) universal-hash grid, min along shingles
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None])
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # hash each UNIQUE token once per batch (the vocabulary is far
        # smaller than the token stream), then everything else is numpy
        token_lists = [t.split() for t in df["text"].fillna("")]
        vocab: dict[str, int] = {}
        for toks in token_lists:
            for t in toks:
                if t not in vocab:
                    vocab[t] = _token_hash(t)
        sigs = []
        for toks in token_lists:
            th = np.fromiter((vocab[t] for t in toks), dtype=np.uint64,
                             count=len(toks))
            sh = _shingle_hashes(th, self.k)
            sigs.append((sh[None, :] * self.a[:, None] + self.b[:, None]).min(axis=1))
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        out["sig"] = [s.astype(np.int64).tobytes() for s in sigs]
        return out


def _explode_bands(df: pd.DataFrame, num_perm: int, bands: int) -> pd.DataFrame:
    rows_per_band = num_perm // bands
    doc_ids, band_keys, sigs = [], [], []
    for doc_id, sig_bytes in zip(df["doc_id"], df["sig"]):
        sig = np.frombuffer(sig_bytes, dtype=np.int64)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            key = (b << 56) ^ (int.from_bytes(digest, "little") >> 8)
            doc_ids.append(doc_id)
            band_keys.append(key)
            sigs.append(sig_bytes)
    return pd.DataFrame(
        {"band_key": np.array(band_keys, dtype=np.int64),
         "doc_id": np.array(doc_ids, dtype=np.int64), "sig": sigs}
    )


def _scan_band_group(g: pd.DataFrame, num_perm: int, threshold: float) -> pd.DataFrame:
    empty = pd.DataFrame({"pair_key": pd.Series(dtype="object"),
                          "doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "est_jaccard": pd.Series(dtype="float64")})
    n = len(g)
    if n < 2:
        return empty
    g = g.drop_duplicates("doc_id")
    n = len(g)
    if n < 2:
        return empty
    sigs = np.stack([np.frombuffer(s, dtype=np.int64) for s in g["sig"]])
    ids = g["doc_id"].to_numpy()
    rows = []
    # candidate groups are tiny (bands make collisions rare) → all-pairs
    for i in range(n):
        agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for jrel in np.flatnonzero(agree >= threshold):
            j = i + 1 + jrel
            a, b = (int(ids[i]), int(ids[j]))
            if a > b:
                a, b = b, a
            rows.append({"pair_key": f"{a}|{b}", "doc_a": a, "doc_b": b,
                         "est_jaccard": float(agree[jrel])})
    return pd.DataFrame(rows) if rows else empty


def minhash_lsh_pairs(docs_ds, num_perm: int = 64, bands: int = 16,
                      k_shingle: int = 3, threshold: float = 0.5,
                      concurrency: int = 2):
    """MinHash-LSH near-duplicate candidate pairs, verified on signature
    agreement (the standard scalable verify — text never reshuffles).

    Returns a Dataset of (doc_a, doc_b, est_jaccard), canonical a<b, deduped.
    """
    import ray

    from ..checks._util import grouped_counts

    # stateless tasks, not an actor pool: MinHasher's state is two small
    # seeded arrays (rebuilt per task in ~µs); tasks skip actor spin-up
    hasher = MinHasher(num_perm=num_perm, k_shingle=k_shingle)
    sigs = docs_ds.map_batches(hasher, batch_format="pandas")
    exploded = sigs.map_batches(
        lambda df: _explode_bands(df, num_perm, bands), batch_format="pandas"
    ).materialize()

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(df["band_key"].to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"band_key": u, "n": c})

    # only colliding band buckets can yield a pair → shrink the keyed scan
    # from ~n·bands groups to collision-sized (same trick as the engine's
    # phash near-dup check)
    coll_tbl = grouped_counts(
        exploded.map_batches(_partial, batch_format="pandas"),
        ["band_key"], min_total=2,
    )
    if len(coll_tbl) == 0:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "est_jaccard": pd.Series(dtype="float64")})
        )
    coll = np.sort(coll_tbl["band_key"].to_numpy(dtype=np.int64))
    ref = ray.put(coll)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        b = df["band_key"].to_numpy(dtype=np.int64)
        idx = np.clip(np.searchsorted(c, b), 0, len(c) - 1)
        return df[c[idx] == b]

    from .groupscan import scan_sorted_groups

    kept = exploded.map_batches(keep, batch_format="pandas")
    empty_pairs = _scan_band_group(
        pd.DataFrame({"band_key": [], "doc_id": [], "sig": []}), num_perm, threshold
    )
    pairs_ds, boundary = scan_sorted_groups(
        kept, "band_key",
        lambda g: _scan_band_group(g, num_perm, threshold), empty_pairs,
    )
    pdf = pairs_ds.to_pandas()
    if "pair_key" not in pdf.columns:
        pdf = empty_pairs.copy()
    uniq = pd.concat([pdf, boundary], ignore_index=True).drop_duplicates("pair_key")
    import ray.data as rd

    return rd.from_pandas(
        (uniq if len(uniq) else empty_pairs).drop(columns=["pair_key"])
    )


def ngram_jaccard_pairs(docs_ds, k_shingle: int = 3, threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 16):
    """Exact n-gram Jaccard near-dup pairs: MinHash-LSH generates the
    candidate set (collision-sized), then the candidates' shingle sets are
    recomputed from their texts — broadcast as a candidate-only dict, never
    a text shuffle — and EXACT Jaccard is verified.

    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    import ray
    import ray.data as rd

    cand = minhash_lsh_pairs(
        docs_ds, num_perm=num_perm, bands=bands, k_shingle=k_shingle,
        threshold=max(0.1, threshold - 0.2),  # slack: est is approximate
    ).to_pandas()
    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "jaccard": pd.Series(dtype="float64")})
    if len(cand) == 0 or "doc_a" not in cand.columns:
        return rd.from_pandas(empty)
    cand_ids = set(cand["doc_a"]) | set(cand["doc_b"])
    ref = ray.put(cand_ids)

    def collect_shingles(df: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(ref)
        sel = df[df["doc_id"].isin(ids)]
        out_id, out_sh = [], []
        for doc_id, text in zip(sel["doc_id"], sel["text"].fillna("")):
            toks = text.split()
            th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64,
                             count=len(toks))
            out_id.append(int(doc_id))
            out_sh.append(_shingle_hashes(th, k_shingle).tobytes())
        return pd.DataFrame({"doc_id": out_id, "shingles": out_sh})

    sh_df = docs_ds.map_batches(collect_shingles, batch_format="pandas").to_pandas()
    lut = {int(i): np.frombuffer(s, dtype=np.uint64)
           for i, s in zip(sh_df["doc_id"], sh_df["shingles"])}
    rows = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = lut.get(int(a)), lut.get(int(b))
        if sa is None or sb is None:
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            rows.append({"doc_a": int(a), "doc_b": int(b),
                         "jaccard": round(float(j), 6)})
    return rd.from_pandas(pd.DataFrame(rows) if rows else empty)


# ------------------------------------------------------------------ simhash


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (deterministic blake2b token
    hashes; public Charikar 2002 construction)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        toks = t.split()
        if not toks:
            out[i] = 0
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
            )
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        val = np.bitwise_or.reduce(
            (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
        out[i] = int(val.astype(np.int64))
    return out


def simhash_pairs(docs_ds, max_hamming: int = 3, concurrency: int = 2):
    """SimHash near-dup pairs via the engine's banded-Hamming machinery."""
    from ..checks.neardup import neardup_violations
    from ..config import NearDupCheck

    def add_simhash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"image_id": df["doc_id"].astype(str), "phash": simhash64(df["text"])}
        )

    hashed = docs_ds.map_batches(add_simhash, batch_format="pandas",
                                 concurrency=concurrency)
    spec = NearDupCheck(column="phash", max_hamming=max_hamming)
    viol = neardup_violations(
        hashed, spec, epoch="simhash",
        pid_fn=lambda b: np.zeros(b.num_rows, dtype=np.int64),
    )
    return viol.map_batches(
        lambda t: t.select(["image_id", "detail"]).rename_columns(
            ["doc_id", "detail"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- exact dup


def exact_dedup(docs_ds):
    """Exact dedup: md5 content hash → hash-partitioned groupby with NATIVE
    aggregates (Min/Count C-paths — no per-group Python).  Returns
    (fp, doc_id, n) — one row per distinct text, SQL-oracle-matchable."""
    from ray.data.aggregate import Count, Min

    from .text import fingerprint

    fps = docs_ds.map_batches(lambda df: fingerprint(df), batch_format="pandas")
    return fps.groupby("fp").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n")
    )


# ------------------------------------------------- embedding near-dup (LSH)


class HyperplaneLSH:
    """Random-hyperplane signatures for cosine LSH (seeded, per-actor)."""

    def __init__(self, dim: int = 64, n_planes: int = 16, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(dim, n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.maximum(norms, 1e-12)
        bits = (emb @ self.planes) > 0
        key = np.zeros(len(emb), dtype=np.int64)
        for j in range(bits.shape[1]):
            key |= bits[:, j].astype(np.int64) << j
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(key, pa.int64()),
                "unit": pa.array(list(emb.astype(np.float32)), pa.list_(pa.float32())),
            }
        )


def embedding_dup_pairs(emb_ds, threshold: float = 0.95, n_planes: int = 12,
                        dim: int = 64, concurrency: int = 2):
    """Near-duplicate embedding pairs (cosine ≥ threshold) via hyperplane-LSH
    bucketing + exact in-bucket cosine. Recall note: a pair at cosine c
    lands in the same bucket with probability (1 − arccos(c)/π)^n_planes;
    at c=0.95, n_planes=12 → ~0.66 — run-to-run deterministic, documented
    as a recall/cost dial (raise recall with multiple tables)."""
    bucketed = emb_ds.map_batches(
        HyperplaneLSH, fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow", concurrency=concurrency,
    )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                              "vec_b": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
        if len(g) < 2:
            return empty
        vecs = np.stack(g["unit"].to_list()).astype(np.float64)
        ids = g["vec_id"].to_numpy()
        sim = vecs @ vecs.T
        ii, jj = np.nonzero(np.triu(sim >= threshold, k=1))
        if len(ii) == 0:
            return empty
        return pd.DataFrame(
            {"vec_a": np.minimum(ids[ii], ids[jj]).astype("int64"),
             "vec_b": np.maximum(ids[ii], ids[jj]).astype("int64"),
             "cosine": np.round(sim[ii, jj], 6)}
        )

    import ray
    import ray.data as rd

    from ..checks._util import grouped_counts

    bucketed = bucketed.materialize()

    def _bpartial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["bucket"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    coll_tbl = grouped_counts(
        bucketed.map_batches(_bpartial, batch_format="pyarrow"),
        ["bucket"], min_total=2,
    )
    if len(coll_tbl):
        coll = np.sort(coll_tbl["bucket"].to_numpy(dtype=np.int64))
        ref = ray.put(coll)

        def keep(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            b = batch["bucket"].to_numpy(zero_copy_only=False)
            idx = np.clip(np.searchsorted(c, b), 0, len(c) - 1)
            return batch.filter(pa.array(c[idx] == b))

        bucketed = bucketed.map_batches(keep, batch_format="pyarrow")
        pairs = bucketed.groupby("bucket").map_groups(scan, batch_format="pandas")
    else:
        pairs = None
    # anchor the schema with one typed empty block — a legitimately
    # pair-free input otherwise yields a schemaless Dataset
    anchor = rd.from_arrow(
        pa.table({"vec_a": pa.array([], pa.int64()),
                  "vec_b": pa.array([], pa.int64()),
                  "cosine": pa.array([], pa.float64())})
    )
    return anchor if pairs is None else anchor.union(pairs)
