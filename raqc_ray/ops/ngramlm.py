"""Corpus-trained bigram language-model scoring (perplexity census) —
the CCNet / Gopher-style quality-filter stage: score every document by
the average negative log-likelihood of its token transitions under a
Laplace-smoothed bigram model trained on the SAME corpus.  Low-NLL docs
are fluent/repetitive, high-NLL docs are noise — the standard
LLM-training-data quality signal (Wenzek et al. CCNet 2020, public).

Model: P(w | u) = (c(u,w) + 1) / (c(u) + V) with c(u,w) the corpus
bigram count, c(u) the count of u as a left context, and V the exact
distinct-token count (Laplace add-one).  Per doc with n >= 2 tokens:

    avg_nll = mean_i [ ln(c(u_i) + V) - ln(c(u_i, w_i) + 1) ]

summed in CANONICAL position order so the float result is
layout-invariant.

Scale shape — no vocabulary-cardinality hash aggregate anywhere (the
`groupby(tok).count()` pathology measured 40× slower than a sort in
`ops/setjoin`): the bigram stream is narrow (doc_id, pos, u, w — 32
B/row, token hashes, never text) and every count is a SORTED-BLOCK
segment annotation:

1. sort by (u, w) → annotate c(u,w) = segment length;
2. sort by u → annotate c(u) = segment length;
3. V = segment COUNT of the block-deduped token stream (one sort of
   block-unique tokens, scalar result);
4. sort by doc_id → per-doc mean of the log terms (positions lexsorted
   inside each segment for the canonical summation order).

Token identity is the 64-bit blake2b hash (collision-free in practice;
the SQL oracle counts token identities — same counts modulo hash
collisions, the q26 invariance argument).  RAQC analog: none (SURVEY
§2 extension: training-data quality scoring family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class _BigramEmitter:
    """Doc batch → (doc_id, pos, u, w) bigram rows (token hashes)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from raqc_ray.ops.dedup import _token_hash

        token_lists = [t.split() for t in df[self.text_col].fillna("")]
        vocab: dict[str, int] = {}
        for toks in token_lists:
            for t in toks:
                if t not in vocab:
                    vocab[t] = _token_hash(t)
        dids, poss, us, ws = [], [], [], []
        for doc_id, toks in zip(df[self.id_col], token_lists):
            n = len(toks)
            if n < 2:
                continue
            th = np.fromiter((vocab[t] for t in toks), dtype=np.uint64,
                             count=n).view(np.int64)
            dids.append(np.full(n - 1, int(doc_id), dtype=np.int64))
            poss.append(np.arange(n - 1, dtype=np.int64))
            us.append(th[:-1])
            ws.append(th[1:])
        if not dids:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "pos": pd.Series(dtype="int64"),
                "u": pd.Series(dtype="int64"),
                "w": pd.Series(dtype="int64")})
        return pd.DataFrame({"doc_id": np.concatenate(dids),
                             "pos": np.concatenate(poss),
                             "u": np.concatenate(us),
                             "w": np.concatenate(ws)})


class _TokenEmitter:
    """Doc batch → block-unique token hashes (for the exact V count)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from raqc_ray.ops.dedup import _token_hash

        vocab: dict[str, int] = {}
        for text in df[self.text_col].fillna(""):
            for t in text.split():
                if t not in vocab:
                    vocab[t] = _token_hash(t)
        return pd.DataFrame({"tok": np.fromiter(
            vocab.values(), dtype=np.uint64,
            count=len(vocab)).view(np.int64)})


def _annotate_count(ds, keys, out_cols: list[str], count_col: str):
    """Sorted-block segment-count annotation: each row gains
    ``count_col`` = the number of rows sharing its ``keys`` value."""
    from raqc_ray.ops.groupscan import scan_sorted_groups

    empty = pd.DataFrame(
        {c: pd.Series(dtype="int64") for c in out_cols + [count_col]})

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g[out_cols].copy()
        out[count_col] = np.int64(len(g))
        return out

    def block_fn(interior: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        lens = (ends - starts).astype(np.int64)
        out = interior[out_cols].copy()
        out[count_col] = np.repeat(lens, lens)
        return out

    return scan_sorted_groups(ds, keys, group_fn, empty, min_group=1,
                              block_fn=block_fn)


def exact_distinct_scalar(ds, col: str) -> int:
    """Exact global COUNT(DISTINCT col) via block-dedup + one sort +
    segment count (no vocabulary-cardinality hash aggregate)."""
    from raqc_ray.ops.groupscan import scan_sorted_groups

    dedup = ds.map_batches(
        lambda df: df[[col]].drop_duplicates(), batch_format="pandas")
    empty = pd.DataFrame({"n": pd.Series(dtype="int64")})
    seg = scan_sorted_groups(
        dedup, col,
        lambda g: pd.DataFrame({"n": pd.Series([1], dtype="int64")}),
        empty, min_group=1,
        block_fn=lambda df, s, e: pd.DataFrame(
            {"n": pd.Series([len(s)], dtype="int64")}))
    total = seg.sum("n")
    if total is None:  # empty input
        return 0
    return int(total if not isinstance(total, dict) else total["sum(n)"])


def bigram_nll_census(docs_ds, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Per-document average bigram NLL under the corpus-trained
    Laplace-smoothed model.  Returns a Dataset
    ``(doc_id, n_trans, avg_nll)`` — docs with < 2 tokens are excluded
    (no transitions to score)."""
    from raqc_ray.ops.groupscan import scan_sorted_groups

    big = docs_ds.map_batches(
        _BigramEmitter(id_col, text_col), batch_format="pandas"
    ).materialize()  # consumed by two annotation sorts + V is separate

    v = exact_distinct_scalar(
        docs_ds.map_batches(_TokenEmitter(text_col),
                            batch_format="pandas"), "tok")

    ann1 = _annotate_count(big, ["u", "w"],
                           ["doc_id", "pos", "u", "w"], "c_uw")
    ann2 = _annotate_count(ann1, "u",
                           ["doc_id", "pos", "u", "w", "c_uw"], "c_u")

    def nll_terms(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id", "pos"]].copy()
        out["nll"] = (np.log(df["c_u"].to_numpy(np.float64) + v)
                      - np.log(df["c_uw"].to_numpy(np.float64) + 1.0))
        return out

    terms = ann2.map_batches(nll_terms, batch_format="pandas")

    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "n_trans": pd.Series(dtype="int64"),
                          "avg_nll": pd.Series(dtype="float64")})

    def doc_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("pos", kind="stable")  # canonical sum order
        s = float(g["nll"].to_numpy(np.float64).sum())
        return pd.DataFrame({
            "doc_id": pd.Series([int(g["doc_id"].iloc[0])], dtype="int64"),
            "n_trans": pd.Series([len(g)], dtype="int64"),
            "avg_nll": pd.Series([round(s / len(g), 6)], dtype="float64"),
        })

    def doc_block(interior: pd.DataFrame, starts: np.ndarray,
                  ends: np.ndarray) -> pd.DataFrame:
        lens = (ends - starts).astype(np.int64)
        n = int(lens.sum())
        seg = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        perm = np.lexsort((interior["pos"].to_numpy(np.int64), seg))
        nll = interior["nll"].to_numpy(np.float64)[perm]
        starts2 = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sums = np.add.reduceat(nll, starts2) if n else np.zeros(0)
        first = interior["doc_id"].to_numpy(np.int64)[perm][starts2]
        return pd.DataFrame({
            "doc_id": first,
            "n_trans": lens,
            "avg_nll": np.round(sums / lens, 6),
        })

    return scan_sorted_groups(terms, "doc_id", doc_group, empty,
                              min_group=1, block_fn=doc_block)
