"""Exact set-similarity join via prefix filtering (SSJoin / PPJoin
family — Chaudhuri et al. ICDE'06, Xiao et al. WWW'08; public
algorithms).

The LSH path (`ops/dedup.ngram_jaccard_pairs`) is the production near-dup
pipeline: collision-sized candidates, probabilistic recall.  This
operator is its provably-EXACT complement — every pair with Jaccard >=
threshold is found, no recall caveat — at the cost of building a prefix
inverted index (one extra shuffle).  Same exact/approx pairing as
q20 brute-force vs q21 IVF for ANN.

Prefix-filter lemma (under ANY global total order on tokens): order each
shingle set ascending and keep only its first ``|x| - ceil(t*|x|) + 1``
tokens (the *prefix*).  Two sets with Jaccard >= t must share at least
one prefix token — because J >= t implies overlap >= ceil(t*max(|a|,|b|))
while disjoint prefixes bound the overlap by ceil(t*|a|) - 1 < t*|a|.
So grouping the prefix index by token yields a complete candidate set,
and the shared distributed verifier
(`ops/dedup.verify_jaccard_candidates`) computes exact Jaccard per
candidate on workers.

Two global orders are provided:

- ``order="hash"``: the shingle hash value itself.  One
  shuffle (the token-bucket sort).  Hash order is uniform-random over
  the vocabulary, so a high-document-frequency shingle is as likely to
  land in prefixes as a rare one — fine for fixture-scale and
  low-redundancy corpora, quadratic-bucket risk on stopword-heavy ones
  (opt-in when the corpus is known low-redundancy and the extra two
  sorts matter).
- ``order="df"`` (DEFAULT — VERDICT r4 #4: at 100-TB the df order is
  the only safe default; callers should not discover skew via a raised
  ``max_bucket``): ascending document frequency (the PPJoin ordering).
  Two extra sorts of the narrow exploded token stream — sort by tok to
  annotate df (= segment length; a hash ``groupby(tok).count()`` over
  the vocabulary-cardinality key set measured 40× slower), sort by doc
  to cut the prefix under (df, tok) order, both via the sorted-block
  scan — and prefix tokens are then the RAREST shingles of each doc,
  which is what keeps candidate buckets small on skewed vocabularies.
  This is the 100-TB path.

Both orders return byte-identical results (exactness does not depend on
the order; only pruning power does) — asserted in tests.

Skew guard: a candidate bucket larger than ``max_bucket`` raises with a
pointer at ``order="df"`` / the LSH path instead of silently emitting
C(n,2) pairs (mirrors ``grouped_cooccurrence.max_distinct``).

Scale shape: shuffles move only (tok:int64, doc_id:int64, size:int64)
rows — never text; candidate pairs are collision-sized by the lemma;
verification text fan-out is candidate-sized (see
``verify_jaccard_candidates``).  RAQC analog: none (SURVEY §2 extension
row: training-data dedup family).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_PAIR_EMPTY = pd.DataFrame({
    "doc_a": pd.Series(dtype="int64"),
    "doc_b": pd.Series(dtype="int64"),
})


def _prefix_len(n: int, t: float) -> int:
    return max(1, n - int(math.ceil(t * n)) + 1)


class _PrefixEmitter:
    """Actor-pool stage: doc batch -> prefix index rows
    (tok, doc_id, size) under HASH order (shingle arrays from
    ``_shingle_hashes`` are already unique-ascending)."""

    def __init__(self, k_shingle: int, threshold: float,
                 all_tokens: bool = False):
        self.k = k_shingle
        self.t = threshold
        self.all_tokens = all_tokens

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from raqc_ray.ops.dedup import _shingle_hashes, _token_hash

        # hash each UNIQUE token once per batch (MinHasher's vocab
        # trick — the vocabulary is far smaller than the token stream)
        token_lists = [t.split() for t in df["text"].fillna("")]
        vocab: dict[str, int] = {}
        for toks in token_lists:
            for t in toks:
                if t not in vocab:
                    vocab[t] = _token_hash(t)
        toks_out: list[np.ndarray] = []
        dids: list[np.ndarray] = []
        sizes: list[np.ndarray] = []
        for doc_id, toks in zip(df["doc_id"], token_lists):
            th = np.fromiter((vocab[t] for t in toks),
                             dtype=np.uint64, count=len(toks))
            sh = _shingle_hashes(th, self.k)  # unique, ascending
            n = sh.size
            p = n if self.all_tokens else _prefix_len(n, self.t)
            toks_out.append(sh[:p].view(np.int64))
            dids.append(np.full(p, int(doc_id), dtype=np.int64))
            sizes.append(np.full(p, n, dtype=np.int64))
        if not toks_out:
            return pd.DataFrame({"tok": pd.Series(dtype="int64"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "size": pd.Series(dtype="int64")})
        return pd.DataFrame({"tok": np.concatenate(toks_out),
                             "doc_id": np.concatenate(dids),
                             "size": np.concatenate(sizes)})


def _bucket_pairs(g: pd.DataFrame, threshold: float,
                  max_bucket: int) -> pd.DataFrame:
    """All candidate (doc_a < doc_b) pairs of one token bucket passing
    the size-ratio filter min >= t*max (J <= min/max)."""
    n = len(g)
    if n > max_bucket:
        raise ValueError(
            f"prefix token bucket of {n} docs exceeds max_bucket="
            f"{max_bucket}; use order='df' or the LSH path "
            "(ngram_jaccard_pairs) for this corpus")
    ids = np.sort(g["doc_id"].to_numpy(np.int64))
    order = np.argsort(g["doc_id"].to_numpy(np.int64), kind="stable")
    sz = g["size"].to_numpy(np.int64)[order]
    ai, bi = np.triu_indices(n, k=1)
    lo = np.minimum(sz[ai], sz[bi]).astype(np.float64)
    hi = np.maximum(sz[ai], sz[bi]).astype(np.float64)
    keep = lo >= threshold * hi - 1e-9
    return pd.DataFrame({"doc_a": ids[ai[keep]], "doc_b": ids[bi[keep]]})


def _bucket_pairs_block(interior: pd.DataFrame, starts: np.ndarray,
                        ends: np.ndarray, threshold: float,
                        max_bucket: int) -> pd.DataFrame:
    frames = [
        _bucket_pairs(interior.iloc[s:e], threshold, max_bucket)
        for s, e in zip(starts.tolist(), ends.tolist())
    ]
    frames = [f for f in frames if len(f)]
    return (pd.concat(frames, ignore_index=True) if frames
            else _PAIR_EMPTY.copy())


def prefix_jaccard_join(docs_ds, k_shingle: int = 3,
                        threshold: float = 0.5, order: str = "df",
                        max_bucket: int = 100_000):
    """Exact n-gram Jaccard self-join over ``documents(doc_id, text)``.

    Returns a Dataset of ``(doc_a, doc_b, jaccard)`` with doc_a < doc_b
    and jaccard >= threshold — PROVABLY complete (prefix-filter lemma),
    unlike the LSH candidate path.
    """
    from raqc_ray.ops.dedup import verify_jaccard_candidates
    from raqc_ray.ops.groupscan import scan_sorted_groups

    if order == "hash":
        prefix = docs_ds.map_batches(
            _PrefixEmitter(k_shingle, threshold), batch_format="pandas")
    elif order == "df":
        prefix = _df_ordered_prefix(docs_ds, k_shingle, threshold)
    else:
        raise ValueError(f"order must be 'hash' or 'df', got {order!r}")

    cand_ds = scan_sorted_groups(
        prefix.select_columns(["tok", "doc_id", "size"]),
        "tok",
        lambda g: _bucket_pairs(g, threshold, max_bucket),
        _PAIR_EMPTY,
        min_group=2,
        block_fn=lambda df, s, e: _bucket_pairs_block(
            df, s, e, threshold, max_bucket),
    )
    # candidate pairs are collision-sized by the lemma; dedup across
    # shared prefix tokens on the driver (same contract as the LSH path)
    cand = cand_ds.to_pandas()
    if len(cand):
        cand = cand.drop_duplicates(["doc_a", "doc_b"], ignore_index=True)
    return verify_jaccard_candidates(docs_ds, cand, k_shingle, threshold)


def _df_ordered_prefix(docs_ds, k_shingle: int, threshold: float):
    """Prefix index rows under ascending-(df, tok) order, in two
    sorted-block scans (no hash aggregate, no join):

    1. sort the exploded (tok, doc_id, size) stream by ``tok`` and
       annotate each row with its token's document frequency = segment
       length (a ``groupby(tok).count()`` would hash-shuffle a
       vocabulary-cardinality key set — measured 40× slower than the
       sort at 1.9M near-unique tokens);
    2. sort by ``doc_id`` and cut each doc's prefix under the (df, tok)
       order — one vectorized ``np.lexsort`` per block, no per-group
       Python.
    """
    from raqc_ray.ops.groupscan import scan_sorted_groups

    full = docs_ds.map_batches(
        _PrefixEmitter(k_shingle, threshold, all_tokens=True),
        batch_format="pandas")

    ann_empty = pd.DataFrame({"tok": pd.Series(dtype="int64"),
                              "doc_id": pd.Series(dtype="int64"),
                              "size": pd.Series(dtype="int64"),
                              "df": pd.Series(dtype="int64")})

    def ann_group(g: pd.DataFrame) -> pd.DataFrame:
        out = g[["tok", "doc_id", "size"]].copy()
        out["df"] = np.int64(len(g))
        return out

    def ann_block(interior: pd.DataFrame, starts: np.ndarray,
                  ends: np.ndarray) -> pd.DataFrame:
        # min_group=1 → the qualifying segments tile the whole interior
        lens = (ends - starts).astype(np.int64)
        out = interior[["tok", "doc_id", "size"]].copy()
        out["df"] = np.repeat(lens, lens)
        return out

    ann = scan_sorted_groups(full, "tok", ann_group, ann_empty,
                             min_group=1, block_fn=ann_block)

    empty = pd.DataFrame({"tok": pd.Series(dtype="int64"),
                          "doc_id": pd.Series(dtype="int64"),
                          "size": pd.Series(dtype="int64")})

    def cut_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["df", "tok"], kind="stable")
        p = _prefix_len(len(g), threshold)
        out = g.iloc[:p]
        return pd.DataFrame({
            "tok": out["tok"].to_numpy(np.int64),
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "size": out["size"].to_numpy(np.int64),
        })

    def cut_block(interior: pd.DataFrame, starts: np.ndarray,
                  ends: np.ndarray) -> pd.DataFrame:
        lens = (ends - starts).astype(np.int64)
        n = int(lens.sum())
        seg = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        tokv = interior["tok"].to_numpy(np.int64)
        dfv = interior["df"].to_numpy(np.int64)
        perm = np.lexsort((tokv, dfv, seg))  # primary seg, then df, tok
        starts2 = np.concatenate([[0], np.cumsum(lens)[:-1]])
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts2, lens)
        plen = np.maximum(
            np.int64(1),
            lens - np.ceil(threshold * lens).astype(np.int64) + 1)
        keep = rank < np.repeat(plen, lens)
        sel = interior.iloc[perm[keep]]
        return pd.DataFrame({
            "tok": sel["tok"].to_numpy(np.int64),
            "doc_id": sel["doc_id"].to_numpy(np.int64),
            "size": sel["size"].to_numpy(np.int64),
        })

    return scan_sorted_groups(
        ann.select_columns(["doc_id", "tok", "size", "df"]),
        "doc_id", cut_group, empty, min_group=1, block_fn=cut_block)
