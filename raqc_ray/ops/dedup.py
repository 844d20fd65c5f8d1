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


_SM1 = np.uint64(0xBF58476D1CE4E5B9)  # splitmix64 constants (public)
_SM2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele et al. 2014) — avalanching
    uint64 → uint64, deterministic across processes."""
    x = (x ^ (x >> np.uint64(30))) * _SM1
    x = (x ^ (x >> np.uint64(27))) * _SM2
    return x ^ (x >> np.uint64(31))


def _band_keys(df: pd.DataFrame, num_perm: int, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 LSH band keys, fully vectorized: signatures
    reshape to (n_docs, bands, rows_per_band) and each band chunk hashes
    via ``rows_per_band`` chained splitmix64 rounds (position-mixed, so
    chunk order matters).  Identical chunks → identical keys, so LSH
    recall is exactly the banded-MinHash guarantee; cross-chunk collisions
    only ADD candidates (verified downstream on signature agreement)."""
    rpb = num_perm // bands
    n = len(df)
    sigs = np.frombuffer(b"".join(df["sig"]), dtype=np.int64
                         ).reshape(n, num_perm).view(np.uint64)
    S = sigs.reshape(n, bands, rpb)
    h = np.zeros((n, bands), dtype=np.uint64)
    for j in range(rpb):
        # wrapping j·MIX precomputed in Python ints (numpy warns on scalar
        # uint64 overflow even though wraparound is intended)
        jmix = np.uint64((j * int(_SHINGLE_MIX)) & 0xFFFFFFFFFFFFFFFF)
        h = _mix64(h ^ (S[:, :, j] + jmix))
    band_idx = np.arange(bands, dtype=np.uint64)[None, :]
    return ((band_idx << np.uint64(56)) ^ (h >> np.uint64(8))).view(np.int64)


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
    # materialize the SIGNATURES (one 8·num_perm-byte row per doc), not
    # the band explosion: the stream is consumed twice (count pass +
    # explode pass) and the old exploded materialize duplicated every
    # signature ×bands in the object store before any collision filter
    sigs = docs_ds.map_batches(hasher, batch_format="pandas").materialize()

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(_band_keys(df, num_perm, bands).ravel(),
                         return_counts=True)
        return pd.DataFrame({"band_key": u, "n": c})

    # narrow pre-pass: count collisions on band KEYS only (nothing
    # exploded, no signatures shipped) — only colliding buckets can yield
    # a pair, so the keyed scan shrinks from ~n·bands groups to
    # collision-sized (same pattern as checks/neardup.py and embedding
    # near-dup below)
    coll_tbl = grouped_counts(
        sigs.map_batches(_partial, batch_format="pandas"),
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

    def explode_colliding(df: pd.DataFrame) -> pd.DataFrame:
        """Fused explode + collision filter: signatures are duplicated
        per band ONLY for rows landing in a colliding bucket (typically
        a tiny fraction), so the sort that follows moves collision-sized
        data instead of ×bands the signature volume."""
        c = ray.get(ref)
        keys = _band_keys(df, num_perm, bands).ravel()
        idx = np.clip(np.searchsorted(c, keys), 0, len(c) - 1)
        keep = c[idx] == keys
        return pd.DataFrame(
            {"band_key": keys[keep],
             "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), bands)[keep],
             "sig": np.repeat(df["sig"].to_numpy(), bands)[keep]}
        )

    from .groupscan import scan_sorted_groups

    kept = sigs.map_batches(explode_colliding, batch_format="pandas")
    empty_pairs = _scan_band_group(
        pd.DataFrame({"band_key": [], "doc_id": [], "sig": []}), num_perm, threshold
    )
    pairs_ds = scan_sorted_groups(
        kept, "band_key",
        lambda g: _scan_band_group(g, num_perm, threshold), empty_pairs,
    )
    uniq = pairs_ds.to_pandas().drop_duplicates("pair_key")
    import ray.data as rd

    return rd.from_pandas(
        (uniq if len(uniq) else empty_pairs).drop(columns=["pair_key"])
    )


def ngram_jaccard_pairs(docs_ds, k_shingle: int = 3, threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 16):
    """Exact n-gram Jaccard near-dup pairs: MinHash-LSH generates the
    candidate set (collision-sized), then EXACT Jaccard is verified
    DISTRIBUTED — a broadcast doc→pair membership map fans each candidate
    doc's shingle set out to its pairs, and the sorted-group scan computes
    one intersection per pair on workers.  No text or shingle set ever
    lands on the driver; driver state is only the (doc_a, doc_b) pair
    list, which is collision-sized by construction.

    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    import ray
    import ray.data as rd

    from raqc_ray.ops.groupscan import scan_sorted_groups

    cand = minhash_lsh_pairs(
        docs_ds, num_perm=num_perm, bands=bands, k_shingle=k_shingle,
        threshold=max(0.1, threshold - 0.2),  # slack: est is approximate
    ).to_pandas()
    return verify_jaccard_candidates(docs_ds, cand, k_shingle,
                                     threshold)


def verify_jaccard_candidates(docs_ds, cand: pd.DataFrame,
                              k_shingle: int, threshold: float):
    """Distributed EXACT-Jaccard verification of a candidate pair list
    (columns ``doc_a``/``doc_b``) — the factored second half of
    :func:`ngram_jaccard_pairs`, shared with the prefix-filter exact
    join (`ops/setjoin`).  Candidate-sized broadcast membership map,
    shingle sets fan out to their pairs, one intersection per pair on
    workers; returns ``(doc_a, doc_b, jaccard)`` with jaccard ≥
    ``threshold``."""
    import ray
    import ray.data as rd

    from raqc_ray.ops.groupscan import scan_sorted_groups

    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "jaccard": pd.Series(dtype="float64")})
    if len(cand) == 0 or "doc_a" not in cand.columns:
        return rd.from_pandas(empty)
    # doc_id -> [(pair_id, side)] membership, broadcast once (candidate-
    # sized: two entries per LSH collision pair)
    membership: dict[int, list[tuple[int, int]]] = {}
    for pid, (a, b) in enumerate(zip(cand["doc_a"], cand["doc_b"])):
        membership.setdefault(int(a), []).append((pid, 0))
        membership.setdefault(int(b), []).append((pid, 1))
    ref = ray.put(membership)

    def emit_memberships(df: pd.DataFrame) -> pd.DataFrame:
        mem = ray.get(ref)
        pids: list[int] = []
        sides: list[int] = []
        dids: list[int] = []
        shs: list[bytes] = []
        for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
            lst = mem.get(int(doc_id))
            if not lst:
                continue
            toks = text.split()
            th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64,
                             count=len(toks))
            shb = _shingle_hashes(th, k_shingle).tobytes()
            for pid, side in lst:
                pids.append(pid)
                sides.append(side)
                dids.append(int(doc_id))
                shs.append(shb)
        return pd.DataFrame({
            "pair_id": pd.Series(pids, dtype="int64"),
            "side": pd.Series(sides, dtype="int64"),
            "doc_id": pd.Series(dids, dtype="int64"),
            "shingles": pd.Series(shs, dtype="object"),
        })

    memb = docs_ds.map_batches(emit_memberships, batch_format="pandas")

    def verify_pair(g: pd.DataFrame) -> pd.DataFrame:
        # exactly one row per side unless a doc was missing (pair dropped
        # by min_group=2) — order by side so (doc_a, doc_b) is stable
        g = g.sort_values("side")
        if g["side"].iloc[0] == g["side"].iloc[-1]:
            return empty
        sa = np.frombuffer(g["shingles"].iloc[0], dtype=np.uint64)
        sb = np.frombuffer(g["shingles"].iloc[-1], dtype=np.uint64)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 0.0
        if j < threshold:
            return empty
        return pd.DataFrame({
            "doc_a": pd.Series([int(g["doc_id"].iloc[0])], dtype="int64"),
            "doc_b": pd.Series([int(g["doc_id"].iloc[-1])], dtype="int64"),
            "jaccard": pd.Series([round(float(j), 6)], dtype="float64"),
        })

    return scan_sorted_groups(memb, "pair_id", verify_pair, empty,
                              min_group=2)


# ------------------------------------------------------------------ simhash


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (deterministic blake2b token
    hashes; public Charikar 2002 construction).

    Vectorized across the BATCH: each *unique* token is hashed once (the
    vocabulary is far smaller than the token stream), the full token-hash
    stream unpacks to a (n_tokens, 64) bit matrix in one ``np.unpackbits``,
    and per-doc bit sums come from one ``np.add.reduceat`` — no per-token
    Python in the hot path.
    """
    token_lists = [t.split() for t in texts.fillna("")]
    counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                         count=len(token_lists))
    out = np.zeros(len(token_lists), dtype=np.int64)
    nonempty = np.flatnonzero(counts > 0)
    if nonempty.size == 0:
        return out
    flat = np.asarray([tok for i in nonempty for tok in token_lists[i]],
                      dtype=object)
    codes, uniq = pd.factorize(flat)  # hash-based; ~10× np.unique on strings
    uh = np.fromiter((_token_hash(t) for t in uniq), dtype=np.uint64,
                     count=len(uniq))
    # (V, 64) bit matrix of UNIQUE token hashes; little-endian byte view +
    # bitorder='little' puts bit j of the hash in column j ((h >> j) & 1)
    ubits = np.unpackbits(uh.view(np.uint8).reshape(-1, 8), axis=1,
                          bitorder="little")
    ncnt = counts[nonempty]
    offs = np.concatenate([[0], np.cumsum(ncnt)[:-1]])
    # per-doc bit sums: one uint8 gather + column sum per doc (vectorized
    # inner; ~15 µs/doc incl. numpy dispatch — beats reduceat by ~50×)
    sums = np.empty((len(ncnt), 64), np.int32)
    for d in range(len(ncnt)):
        sums[d] = ubits[codes[offs[d]:offs[d] + ncnt[d]]].sum(
            axis=0, dtype=np.int32)
    # acc_j = (#ones − #zeros) = 2·sum − n; bit set where acc > 0
    pos = (2 * sums) > ncnt[:, None]
    shifts = np.arange(64, dtype=np.uint64)
    out[nonempty] = (pos.astype(np.uint64) << shifts).sum(
        axis=1, dtype=np.uint64).view(np.int64)
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


def normalized_dedup(docs_ds, text_col: str = "text"):
    """Exact dedup AFTER C4/CCNet-style canonicalization — the form
    dedup actually runs in training-data pipelines (curly quotes,
    case, spacing and punctuation variants of the same document must
    collapse to one key).

    Normalization (vectorized Arrow RE2 kernels — the same regex
    engine DuckDB's ``regexp_replace`` uses, so the SQL oracle is
    byte-identical): lowercase → strip every ``[^a-z0-9 ]`` run to a
    space → collapse space runs → trim.  The normalized text never
    leaves the block: only (fp, doc_id) rows shuffle into the same
    native Min/Count groupby as `exact_dedup`.

    Returns (fp, doc_id, n): one row per distinct normalized text with
    the smallest doc_id and the member count."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Min

    def norm_fp(b: pa.Table) -> pd.DataFrame:
        t = pc.fill_null(b[text_col].cast(pa.string()), "")
        t = pc.utf8_lower(t)
        t = pc.replace_substring_regex(t, "[^a-z0-9 ]+", " ")
        t = pc.replace_substring_regex(t, " +", " ")
        t = pc.utf8_trim_whitespace(t)
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t.to_pylist()]
        return pd.DataFrame({
            "fp": fps,
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False)})

    return (docs_ds.map_batches(norm_fp, batch_format="pyarrow")
            .groupby("fp")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Count(alias_name="n")))


# ------------------------------------------------- embedding near-dup (LSH)


def _emb_matrix(col: "pa.ChunkedArray", dim: int) -> np.ndarray:
    """Embedding column → (n, dim) float64 matrix without per-row pylist.

    Handles list<float> / fixed_size_list<float> (flatten: one zero-copy
    child read) and Ray's ArrowTensorArray extension (to_numpy)."""
    arr = col.combine_chunks()
    if isinstance(arr, (pa.ListArray, pa.LargeListArray,
                        pa.FixedSizeListArray)):
        vals = arr.flatten()
        return np.asarray(vals.to_numpy(zero_copy_only=False),
                          dtype=np.float64).reshape(-1, dim)
    out = arr.to_numpy(zero_copy_only=False)
    if out.dtype == object:
        out = np.stack(list(out))
    return np.asarray(out, dtype=np.float64).reshape(-1, dim)


def _unit(emb: np.ndarray) -> np.ndarray:
    return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)


class HyperplaneLSH:
    """Multi-table random-hyperplane signatures for cosine LSH.

    Seeded + deterministic across processes: every task rebuilds the same
    plane matrix (one (dim, n_tables·n_planes) normal draw — microseconds).
    A pair at cosine c shares a given table's bucket with probability
    p = (1 − arccos(c)/π)^n_planes; over T independent tables the recall
    is 1 − (1 − p)^T.  Defaults (n_planes=12, n_tables=8) give ≈0.93 at
    c=0.95 — the multi-table union is the standard recall dial (Charikar
    2002; Indyk–Motwani 1998).
    """

    def __init__(self, dim: int = 64, n_planes: int = 12, n_tables: int = 8,
                 seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(dim, n_tables * n_planes))
        self.n_planes, self.n_tables = n_planes, n_tables

    def keys(self, unit_emb: np.ndarray) -> np.ndarray:
        """(n, dim) unit vectors → (n, n_tables) int64 bucket keys (table
        index tagged in the high bits so tables never cross-collide)."""
        bits = (unit_emb @ self.planes) > 0
        B = bits.reshape(len(unit_emb), self.n_tables, self.n_planes)
        w = (np.int64(1) << np.arange(self.n_planes, dtype=np.int64))
        key = (B * w).sum(axis=2, dtype=np.int64)
        key |= np.arange(self.n_tables, dtype=np.int64)[None, :] << np.int64(48)
        return key


def _scan_bucket_segments(tbl, threshold: float, dim: int) -> pd.DataFrame:
    """Sort collision rows by bucket, exact-cosine all-pairs per segment —
    one vectorized multi-group scan (runs inside a Ray task)."""
    empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                          "vec_b": pd.Series(dtype="int64"),
                          "cosine": pd.Series(dtype="float64")})
    if tbl is None or tbl.num_rows == 0:
        return empty
    buckets = tbl["bucket"].to_numpy(zero_copy_only=False)
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    vecs = _emb_matrix(tbl["unit"], dim)
    order = np.argsort(buckets, kind="stable")
    buckets, ids, vecs = buckets[order], ids[order], vecs[order]
    bounds = np.flatnonzero(buckets[1:] != buckets[:-1]) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(buckets)]])
    frames = []
    for s, e in zip(starts.tolist(), ends.tolist()):
        if e - s < 2:
            continue
        sub = vecs[s:e]
        sim = sub @ sub.T
        ii, jj = np.nonzero(np.triu(sim >= threshold, k=1))
        if len(ii):
            frames.append(pd.DataFrame(
                {"vec_a": np.minimum(ids[s + ii], ids[s + jj]),
                 "vec_b": np.maximum(ids[s + ii], ids[s + jj]),
                 "cosine": np.round(sim[ii, jj], 6)}))
    return pd.concat(frames, ignore_index=True) if frames else empty


def embedding_dup_pairs(emb_ds, threshold: float = 0.95, n_planes: int = 12,
                        n_tables: int = 8, dim: int = 64,
                        driver_threshold: int = 5_000_000):
    """Near-duplicate embedding pairs (cosine ≥ threshold): multi-table
    hyperplane-LSH bucketing + exact in-bucket cosine verify.

    Scale shape (same recipe as the phash near-dup check): a NARROW
    bucket-count pre-pass (keys only — vectors never leave their block)
    finds colliding buckets; only collision rows explode with their unit
    vector; the collision-sized scan is exact.  Multi-table union recall
    at the defaults ≈ 1 − (1 − 0.278)^8 ≈ 0.93 for cosine 0.95 pairs
    (see HyperplaneLSH).  Pair dedup across tables is driver-side on the
    candidate-sized result.
    """
    import ray
    import ray.data as rd

    from ..checks._util import collect_and_reduce, decide_path, grouped_counts

    kw = dict(dim=dim, n_planes=n_planes, n_tables=n_tables)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        lsh = HyperplaneLSH(**kw)
        keys = lsh.keys(_unit(_emb_matrix(batch["embedding"], dim))).ravel()
        u, c = np.unique(keys, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    anchor = rd.from_arrow(
        pa.table({"vec_a": pa.array([], pa.int64()),
                  "vec_b": pa.array([], pa.int64()),
                  "cosine": pa.array([], pa.float64())})
    )
    coll_tbl = grouped_counts(
        emb_ds.map_batches(bucket_counts, batch_format="pyarrow"),
        ["bucket"], min_total=2,
    )
    if len(coll_tbl) == 0:
        return anchor
    coll = np.sort(coll_tbl["bucket"].to_numpy(dtype=np.int64))
    ref = ray.put(coll)

    def explode_colliding(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        lsh = HyperplaneLSH(**kw)
        emb = _unit(_emb_matrix(batch["embedding"], dim))
        keys = lsh.keys(emb)  # (n, T)
        idx = np.clip(np.searchsorted(c, keys), 0, len(c) - 1)
        ri, rt = np.nonzero(c[idx] == keys)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pa.array(emb[ri].astype(np.float32).ravel(), pa.float32())
        return pa.table(
            {"bucket": pa.array(keys[ri, rt], pa.int64()),
             "vec_id": pa.array(vid[ri], pa.int64()),
             "unit": pa.FixedSizeListArray.from_arrays(flat, dim)}
        )

    keyed = emb_ds.map_batches(explode_colliding, batch_format="pyarrow")
    keyed, _n, distributed = decide_path(keyed, driver_threshold)
    if distributed:
        # Sorted-block scan, NOT groupby().map_groups (one Python task
        # per bucket — the groupscan.py rationale): ONE sort by bucket,
        # then each sorted block verifies ALL its complete buckets in a
        # single vectorized call; boundary buckets (≤ 2 per block) are
        # re-scanned once, size-routed off the driver when hot.  Pair
        # values are order-insensitive (each cosine is one dot product),
        # so this is byte-identical to the per-bucket path.
        from .groupscan import scan_sorted_groups

        def _frame_tbl(g: pd.DataFrame) -> pa.Table:
            return pa.table(
                {"bucket": pa.array(g["bucket"].to_numpy(), pa.int64()),
                 "vec_id": pa.array(g["vec_id"].to_numpy(), pa.int64()),
                 "unit": pa.array(g["unit"].to_list(),
                                  pa.list_(pa.float32()))})

        out_empty = pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"),
             "vec_b": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")})
        pairs = scan_sorted_groups(
            keyed, "bucket",
            group_fn=lambda g: _scan_bucket_segments(
                _frame_tbl(g), threshold, dim),
            out_empty=out_empty, min_group=2,
            block_fn=lambda interior, starts, ends: _scan_bucket_segments(
                _frame_tbl(interior), threshold, dim),
        )
        pdf = pairs.to_pandas()
        if len(pdf) == 0 or "vec_a" not in pdf.columns:
            return anchor
    else:
        pdf = collect_and_reduce(keyed, _scan_bucket_segments, threshold, dim)
    uniq = pdf.drop_duplicates(["vec_a", "vec_b"]).reset_index(drop=True)
    if len(uniq) == 0:
        return anchor
    return rd.from_pandas(uniq)


def exact_cosine_pairs(emb_ds, threshold: float, dim: int = 64):
    """Exact all-pairs cosine ≥ threshold — the AUDIT-scale oracle op.

    O(n²) by nature: use it to verify the LSH path (embedding_dup_pairs)
    on samples; at 100-TB scale the LSH path is the production route.
    The full normalized matrix broadcasts ONCE via ``ray.put`` (same
    pattern as ops/ann.brute_topk's query matrix) and every block matmuls
    against it, emitting canonical ``vec_a < vec_b`` pairs — so the work
    distributes even though the comparison count is quadratic.
    """
    import ray
    import ray.data as rd

    pdf = emb_ds.to_pandas()  # documented audit-scale materialization
    anchor = rd.from_arrow(
        pa.table({"vec_a": pa.array([], pa.int64()),
                  "vec_b": pa.array([], pa.int64()),
                  "cosine": pa.array([], pa.float64())})
    )
    if len(pdf) == 0:
        return anchor
    ids = pdf["vec_id"].to_numpy().astype(np.int64)
    mat = _unit(np.stack(pdf["embedding"].to_list()).astype(np.float64))
    ref = ray.put((ids, mat))

    def scan(batch: pa.Table) -> pa.Table:
        aid, amat = ray.get(ref)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = _unit(_emb_matrix(batch["embedding"], dim))
        sim = emb @ amat.T  # (block, n)
        ii, jj = np.nonzero(sim >= threshold)
        keep = vid[ii] < aid[jj]  # canonical + drops self-pairs
        ii, jj = ii[keep], jj[keep]
        return pa.table(
            {"vec_a": pa.array(vid[ii], pa.int64()),
             "vec_b": pa.array(aid[jj], pa.int64()),
             "cosine": pa.array(np.round(sim[ii, jj], 6), pa.float64())}
        )

    return anchor.union(emb_ds.map_batches(scan, batch_format="pyarrow"))


def dedup_corpus(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                 broadcast_limit: int = 2_000_000, **lsh_kwargs):
    """End-to-end near-duplicate corpus dedup — the production flow a
    training-data pipeline actually runs: MinHash-LSH pairs
    (:func:`minhash_lsh_pairs`) → distributed connected components
    (:func:`raqc_ray.ops.concomp.connected_components`,
    Large-Star/Small-Star) → keep ONE doc per cluster (the minimum id).

    Returns ``(kept_ds, clusters_df)``: ``kept_ds`` is the input with
    non-representative duplicates removed; ``clusters_df`` is the
    (duplicates-sized) pandas assignment ``(node, cluster_id)``.

    Scale switch: the drop-set (non-representatives) is duplicate-sized
    — broadcast as a set into a streaming filter below
    ``broadcast_limit`` ids, else removed with the hash-shuffle
    anti-join (:func:`raqc_ray.ops.join.anti_join`); both paths are
    equivalence-tested."""
    from .concomp import connected_components

    pairs = minhash_lsh_pairs(docs_ds.select_columns([id_col, text_col]),
                              **lsh_kwargs)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": df["doc_a"].astype("int64"),
                             "b": df["doc_b"].astype("int64")})

    cc = connected_components(
        pairs.map_batches(rename, batch_format="pandas")).materialize()
    drops = cc.filter(expr="node != cluster_id")
    n_drop = drops.count()
    if n_drop <= broadcast_limit:
        drop_ids = set(drops.to_pandas()["node"].tolist())

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[~df[id_col].isin(drop_ids)]

        kept = docs_ds.map_batches(keep, batch_format="pandas")
    else:
        from .join import anti_join

        drop_keys = drops.map_batches(
            lambda df: pd.DataFrame({id_col: df["node"].astype("int64")}),
            batch_format="pandas")
        kept = anti_join(docs_ds, drop_keys, on=id_col)
    return kept, cc.to_pandas()
