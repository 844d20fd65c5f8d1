"""Exact shingle CONTAINMENT pairs — the asymmetric near-dup test
Jaccard misses: a short document quoted whole inside a long one has
containment |A∩B| / min(|A|,|B|) ≈ 1 while its Jaccard is tiny, so
quote-inclusion / excerpt / wrapper duplicates need this score
(Broder 1997 distinguishes "resemblance" from "containment" for
exactly this reason).

Candidate generation must also be containment-aware: MinHash-LSH
(the q26 plan) recalls by JACCARD and systematically misses
asymmetric pairs, so this op goes through the exact inverted index
instead:

1. per-doc DISTINCT shingle hashes (the `ops/dedup` tokenizer —
   injective-hash invariance, same contract q26's oracle relies on)
   stream out as ``(shingle, doc)`` rows + a ``(doc, n_sh)`` size
   table;
2. document-frequency pruning: shingles with ``df < 2`` cannot pair
   and shingles with ``df > max_df`` are BOILERPLATE (stop-shingles)
   — dropped by a distributed df groupby + semi-join, the standard
   prefix-filtering move that bounds the pair fan-out at C(max_df,2)
   per shingle.  The score therefore counts intersections over
   non-boilerplate shingles — a DEFINED, oracle-replayable semantic,
   not a silent approximation;
3. pair intersection counts fall out of ONE
   `ops/cooc.grouped_cooccurrence` (sorted-block pair emit + pair
   groupby — nothing quadratic in corpus size);
4. two hash joins attach sizes; the score is pure integer basis
   points ``10000 * inter // min(n_a, n_b)``.

RAQC analog: A10's spirit (near-dup flags) — SURVEY §2 LLM-dedup
surface, the asymmetric complement of q26 exact Jaccard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["shingle_containment_pairs"]


def shingle_containment_pairs(docs_ds, id_col: str = "doc_id",
                              text_col: str = "text",
                              k_shingle: int = 3,
                              threshold_bp: int = 7000,
                              max_df: int = 50):
    """Dataset ``(doc_a, doc_b, inter, containment_bp)`` with
    ``doc_a < doc_b`` and ``containment_bp >= threshold_bp``;
    ``inter`` counts shared non-boilerplate shingles (df in
    [2, max_df]), the denominator is the FULL distinct-shingle count
    of the smaller document."""
    from ray.data.aggregate import Count

    from .cooc import grouped_cooccurrence
    from .dedup import _shingle_hashes, _token_hash
    from .join import hash_join, semi_join

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        shs: list[np.ndarray] = []
        for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
            toks = text.split()
            th = np.fromiter((_token_hash(t) for t in toks),
                             dtype=np.uint64, count=len(toks))
            sh = _shingle_hashes(th, k_shingle)
            ids.append(int(doc_id))
            shs.append(sh.view(np.int64))
        lens = np.array([len(s) for s in shs], dtype=np.int64)
        return pd.DataFrame({
            "sh": np.concatenate(shs) if shs else
            np.array([], dtype=np.int64),
            "doc": np.repeat(np.array(ids, dtype=np.int64), lens),
        })

    rows = docs_ds.map_batches(shingle_rows,
                               batch_format="pandas").materialize()

    def size_rows(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc", sort=False).size().rename("n_sh")
        return g.reset_index()

    # per-doc sizes: shingle_rows are already distinct per doc
    from ray.data.aggregate import Sum

    sizes = (rows.map_batches(size_rows, batch_format="pandas")
             .groupby("doc").aggregate(Sum("n_sh", alias_name="n_sh")))

    # df pruning: keep shingles with 2 <= df <= max_df
    df_tab = (rows.groupby("sh").aggregate(Count(alias_name="df"))
              .filter(expr=f"df >= 2 and df <= {max_df}")
              .select_columns(["sh"]))
    kept = semi_join(rows, df_tab, on="sh")

    inter = grouped_cooccurrence(kept, "sh", "doc",
                                 max_distinct=max_df + 1)

    def _rn(col):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={"doc": col, "n_sh": col + "_n"})

        return fn

    j = hash_join(inter, sizes.map_batches(_rn("__a"),
                                           batch_format="pandas"),
                  on="val_a", right_on="__a")
    j = hash_join(j, sizes.map_batches(_rn("__b"),
                                       batch_format="pandas"),
                  on="val_b", right_on="__b")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        i = df["n"].to_numpy(dtype=np.int64)
        na = df["__a_n"].to_numpy(dtype=np.int64)
        nb = df["__b_n"].to_numpy(dtype=np.int64)
        bp = (10000 * i) // np.minimum(na, nb)
        out = pd.DataFrame({
            "doc_a": df["val_a"].to_numpy(dtype=np.int64),
            "doc_b": df["val_b"].to_numpy(dtype=np.int64),
            "inter": i,
            "containment_bp": bp,
        })
        return out[out["containment_bp"] >= threshold_bp]

    return j.map_batches(score, batch_format="pandas")
