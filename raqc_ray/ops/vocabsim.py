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


def unigram_kl_by_source(ds, key: str, text_col: str,
                         round_to: int = 6):
    """Per-source unigram-distribution KL divergence against the
    corpus: ``(source, n_tokens, n_distinct, kl)`` with
    ``kl = Σ_t (c_st/N_s)·ln((c_st/N_s)/(C_t/N))`` — the
    mixture-composition audit (how far each source's token
    distribution sits from the blend it feeds).  KL ≥ 0 by Gibbs;
    a source ≫ 0 is stylistically isolated, ≈ 0 is redundant with
    the blend.

    Plan: exploded per-block ``(token, source) → count`` combiner
    partials (full occurrence counts, not presence), ONE token sort
    via ``scan_sorted_groups``; each block merges per-(token, source)
    runs, computes per-token corpus counts by a segment sum, and
    accumulates PARTIAL float term sums per source with ``np.add.at``
    — output is |sources|-sized per block.  The per-source totals
    ``N_s`` (and corpus ``N``) come from a first keys-sized pass and
    broadcast into the scan closure, so every term is final at block
    time.  Exact int64 counts; ln epilogue mirrors the SQL oracle's
    expression shape (rounded ``round_to``; term-order float spread
    ≪ the round, q46 discipline).

    Scale shape: nothing vocabulary-sized hash-aggregates; the only
    vocabulary exchange is the range-partitioning sort.  RAQC analog:
    SURVEY §2.9 F1 (within-column drift) — this is the cross-SOURCE
    composition complement."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .groupscan import scan_sorted_groups
    from .vhist import gather_segments, merge_runs

    def carriers(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _token_hash

        toks: list[np.ndarray] = []
        srcs: list[np.ndarray] = []
        vocab: dict[str, int] = {}
        for src, text in zip(df[key], df[text_col].fillna("")):
            ts = text.split()
            for t in ts:
                if t not in vocab:
                    vocab[t] = _token_hash(t)
            th = np.fromiter((vocab[t] for t in ts), dtype=np.uint64,
                             count=len(ts)).view(np.int64)
            toks.append(th)
            srcs.append(np.full(len(ts), src, dtype=object))
        if not toks:
            return pd.DataFrame({"tok": pd.Series(dtype="int64"),
                                 key: pd.Series(dtype="object"),
                                 "__c": pd.Series(dtype="int64")})
        d = pd.DataFrame({"tok": np.concatenate(toks),
                          key: np.concatenate(srcs)})
        d["__c"] = np.ones(len(d), dtype=np.int64)
        return d.groupby(["tok", key], sort=False, as_index=False).sum()

    carr = ds.map_batches(carriers, batch_format="pandas").materialize()

    # per-source token totals (keys-sized) — broadcast into the scan
    totals = (carr.map_batches(
        lambda df: df.groupby(key, as_index=False)["__c"].sum(),
        batch_format="pandas")
        .groupby(key).aggregate(Sum("__c", alias_name="n"))
        .to_pandas())
    n_s = {str(s): int(n) for s, n in zip(totals[key], totals["n"])}
    n_corpus = sum(n_s.values())
    if not n_corpus:
        return rd.from_pandas(pd.DataFrame({
            key: pd.Series(dtype="object"),
            "n_tokens": pd.Series(dtype="int64"),
            "n_distinct": pd.Series(dtype="int64"),
            "kl": pd.Series(dtype="float64")}))
    src_order = sorted(n_s)
    src_code = {s: i for i, s in enumerate(src_order)}
    ref = ray.put((src_code, np.array([n_s[s] for s in src_order],
                                      dtype=np.float64), float(n_corpus)))

    def _terms(src_arr, c_arr, tok_tot_arr):
        code_map, ns_arr, n_all = ray.get(ref)
        codes = np.fromiter((code_map[s] for s in src_arr),
                            dtype=np.int64, count=len(src_arr))
        ps = c_arr / ns_arr[codes]
        pc = tok_tot_arr / n_all
        terms = ps * np.log(ps / pc)
        kl = np.zeros(len(code_map), dtype=np.float64)
        np.add.at(kl, codes, terms)
        nd = np.zeros(len(code_map), dtype=np.int64)
        np.add.at(nd, codes, 1)
        keep = nd > 0
        return pd.DataFrame({
            key: np.array(src_order, dtype=object)[keep],
            "__nd": nd[keep], "__kl": kl[keep]})

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(key, as_index=False)["__c"].sum()
        tok_tot = float(s["__c"].sum())
        return _terms(s[key].astype(str).to_numpy(),
                      s["__c"].to_numpy(dtype=np.float64),
                      np.full(len(s), tok_tot))

    def block_fn(df: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        idx, segid, sizes, cum_excl = gather_segments(starts, ends)
        src = df[key].to_numpy().astype(str)[idx]
        c = df["__c"].to_numpy(dtype=np.int64)[idx]
        order = np.lexsort((src, segid))
        _, seg_m, src_m, c_m = merge_runs(segid, src[order], c[order])
        # per-token corpus count, repeated onto each run
        sm_new = np.ones(len(seg_m), dtype=bool)
        sm_new[1:] = seg_m[1:] != seg_m[:-1]
        sm_starts = np.flatnonzero(sm_new)
        tok_tot = np.add.reduceat(c_m, sm_starts)
        reps = np.diff(np.append(sm_starts, len(seg_m)))
        return _terms(src_m, c_m.astype(np.float64),
                      np.repeat(tok_tot.astype(np.float64), reps))

    out_empty = pd.DataFrame({key: pd.Series(dtype="object"),
                              "__nd": pd.Series(dtype="int64"),
                              "__kl": pd.Series(dtype="float64")})
    partial = scan_sorted_groups(carr, "tok", group_fn, out_empty,
                                 min_group=1, block_fn=block_fn)
    agg = (partial.groupby(key)
           .aggregate(Sum("__nd", alias_name="n_distinct"),
                      Sum("__kl", alias_name="kl")).to_pandas())
    agg["n_tokens"] = agg[key].map(n_s).astype("int64")
    agg["n_distinct"] = agg["n_distinct"].astype("int64")
    agg["kl"] = agg["kl"].round(round_to)
    return rd.from_pandas(
        agg[[key, "n_tokens", "n_distinct", "kl"]]
        .sort_values(key).reset_index(drop=True))
