"""Pairwise GROUP-level vocabulary overlap — the corpus-composition
audit: for every pair of sources (langs, shards), the exact Jaccard
similarity of their token vocabularies.  A training-mixture curator
reads this to spot redundant sources and leakage between supposedly
independent crawls.

Plan (no vocabulary-cardinality hash aggregate — the VERDICT r4 #1
lesson applied at birth): blocks explode text to block-DEDUPED
``(token_hash, source)`` carriers (the vocabulary trick: hash each
distinct token once per block), ONE sort by ``token_hash`` via
``scan_sorted_groups``, and each token's segment emits its distinct
source set's pair counts (C(s,2) rows, s ≤ |sources|) plus per-source
presence — as COUNTS accumulated per block, so the scan's output is
|sources|²-sized partials, re-summed by a tiny final groupby.  Nothing
text-sized or vocabulary-sized ever hash-shuffles; the only exchange
over the vocabulary is the range-partitioning sort (C path).

Token identity is the shared 64-bit ``_token_hash`` (collision odds
~V²/2⁶⁵ — negligible at any real vocabulary; the SQL oracle uses the
plain token string, and the tests pin fixtures where both agree).

RAQC analog: none (SURVEY §2.5 stops at per-partition stats); §2
LLM-pipeline surface (source-overlap / mixture-redundancy census).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def source_vocab_overlap(ds, key: str, text_col: str,
                         round_to: int = 6):
    """Dataset ``(src_a, src_b, v_a, v_b, n_inter, n_union, jaccard)``
    — one row per unordered source pair (src_a < src_b lexically),
    where ``v_*`` are the sources' distinct-token vocabulary sizes and
    ``jaccard = n_inter / n_union`` (rounded)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .groupscan import scan_sorted_groups

    def carriers(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _token_hash

        toks: list[np.ndarray] = []
        srcs: list[np.ndarray] = []
        vocab: dict[str, int] = {}
        for src, text in zip(df[key], df[text_col].fillna("")):
            ts = set(text.split())
            for t in ts:
                if t not in vocab:
                    vocab[t] = _token_hash(t)
            th = np.fromiter((vocab[t] for t in ts), dtype=np.uint64,
                             count=len(ts)).view(np.int64)
            toks.append(th)
            srcs.append(np.full(len(ts), src, dtype=object))
        if not toks:
            return pd.DataFrame({"tok": pd.Series(dtype="int64"),
                                 key: pd.Series(dtype="object")})
        d = pd.DataFrame({"tok": np.concatenate(toks),
                          key: np.concatenate(srcs)})
        return d.drop_duplicates()

    carr = ds.map_batches(carriers, batch_format="pandas")

    def _pair_counts(frames_src: np.ndarray) -> pd.DataFrame:
        """Pair + presence count rows from ONE token's distinct
        source list."""
        ss = np.unique(frames_src.astype(str))
        rows_a, rows_b = [], []
        for i in range(len(ss)):
            rows_a.append(ss[i])
            rows_b.append(ss[i])          # presence carrier (a == b)
            for j in range(i + 1, len(ss)):
                rows_a.append(ss[i])
                rows_b.append(ss[j])
        return pd.DataFrame({"src_a": rows_a, "src_b": rows_b,
                             "cnt": np.ones(len(rows_a),
                                            dtype=np.int64)})

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        return _pair_counts(g[key].to_numpy())

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        from .vhist import gather_segments, merge_runs

        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        src = df[key].to_numpy().astype(str)[idx]
        order = np.lexsort((src, segid))
        # dedup (segment, source) runs (cross-block duplicate carriers)
        _, seg_m, src_m, _ = merge_runs(
            segid, src[order], np.ones(len(src), dtype=np.int64))
        # vectorized over ALL token segments at once: a vocab × S
        # presence matrix and ONE S×S Gram matmul give every pair's
        # co-occurrence count (S = sources present in the block — tiny)
        codes, uniq = pd.factorize(src_m)
        s_count = len(uniq)
        m = np.zeros((len(sizes), s_count), dtype=np.int64)
        m[seg_m, codes] = 1
        gram = m.T @ m                      # S×S: diag = |V_s|, off = ∩
        ai, bi = np.nonzero(np.triu(gram))  # upper triangle incl. diag
        return pd.DataFrame({"src_a": uniq.to_numpy()[ai]
                             if hasattr(uniq, "to_numpy")
                             else np.asarray(uniq)[ai],
                             "src_b": np.asarray(uniq)[bi],
                             "cnt": gram[ai, bi]})

    out_empty = pd.DataFrame({"src_a": pd.Series(dtype="object"),
                              "src_b": pd.Series(dtype="object"),
                              "cnt": pd.Series(dtype="int64")})
    partial = scan_sorted_groups(carr, "tok", group_fn, out_empty,
                                 min_group=1, block_fn=block_fn)
    agg = (partial.groupby(["src_a", "src_b"])
           .aggregate(Sum("cnt", alias_name="cnt")).to_pandas())
    if len(agg) == 0:
        return rd.from_pandas(pd.DataFrame({
            "src_a": pd.Series(dtype="object"),
            "src_b": pd.Series(dtype="object"),
            "v_a": pd.Series(dtype="int64"),
            "v_b": pd.Series(dtype="int64"),
            "n_inter": pd.Series(dtype="int64"),
            "n_union": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64")}))
    sizes = {r.src_a: int(r.cnt) for r in agg.itertuples()
             if r.src_a == r.src_b}
    pairs = agg[agg["src_a"] != agg["src_b"]]
    # every unordered source pair, including zero-overlap ones
    srcs = sorted(sizes)
    inter = {(a, b): 0 for i, a in enumerate(srcs)
             for b in srcs[i + 1:]}
    for r in pairs.itertuples():
        a, b = sorted((r.src_a, r.src_b))
        inter[(a, b)] = inter.get((a, b), 0) + int(r.cnt)
    rows = []
    for (a, b), ni in sorted(inter.items()):
        va, vb = sizes[a], sizes[b]
        nu = va + vb - ni
        rows.append((a, b, va, vb, ni, nu,
                     round(ni / nu, round_to) if nu else 0.0))
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["src_a", "src_b", "v_a", "v_b", "n_inter",
                       "n_union", "jaccard"]))
