"""Corpus-wide duplicated-SPAN census — the substring-level dedup
metric (Lee et al., "Deduplicating Training Data Makes Language Models
Better", ACL 2022: repeated SPANS, not just whole-document duplicates,
drive memorization; the actionable per-document number is the fraction
of its k-token spans that also occur in some OTHER document).

Distinct from the pairwise near-dup ops (q26 Jaccard resemblance,
q164 containment): this is corpus-GLOBAL and POSITIONAL — a span
occupying 30 positions of a doc contributes 30 to the duplicated
count — and the output is one row per document, directly filterable
("drop docs with dup_bp > 2000").

Plan (scale shape):

1. ONE tokenize pass (``map_batches``): each doc emits
   ``(span_hash, doc, cnt)`` rows — ``cnt`` = positions of that
   distinct span inside the doc, so the stream is per-doc-distinct
   compressed and per-doc totals are recoverable as ``Σ cnt`` (no
   second table, no second tokenize).  The rows materialize ONCE
   (the ops/moments discipline — two downstream scans share them).
2. shared-span extraction: ``scan_sorted_groups`` over ``span_hash``
   with a vectorized ``block_fn`` — a segment's rows are the docs
   carrying that span (one row per doc by construction), so keeping
   the rows of segments with >= 2 docs IS the "appears in another
   document" predicate.  ONE all-to-all; nothing vocabulary-sized
   ever lands on the driver, no task per span (the r3-verdict
   map_groups lesson).
3. two doc-sized ``groupby(doc).Sum`` reductions (duplicated
   positions, total positions) + one doc-sized left-outer
   ``hash_join``; ``dup_bp = 10000 * dup // n_spans`` in exact
   integer arithmetic (non-negative, so floor == truncation and the
   SQL ``//`` oracle agrees bit-for-bit).

Span identity is the per-position multiply-rotate mix over blake2b
token hashes (``ops/dedup`` tokenizer WITHOUT the distinct collapse) —
the same injective-hash-invariance contract q26/q164 document: the
SQL oracle groups the gram TEXT, equal iff the hashes are (collision
probability ~ spans²/2^64, zero at fixture scale and negligible below
10^8 distinct spans; at true corpus scale swap in a 128-bit digest).

Docs shorter than k tokens have no spans and emit no row.

RAQC analog: none (SURVEY §2 LLM-dedup surface — the substring-level
complement of the whole-doc q12/q184 and pairwise q26/q164 family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["duplicated_span_census"]


def duplicated_span_census(docs_ds, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 8):
    """Dataset with one row per document having >= 1 span:
    ``(id_col, n_spans, dup_spans, dup_bp)`` where ``n_spans`` is the
    doc's k-token span count (``len(tokens) - k + 1``), ``dup_spans``
    counts positions whose span also occurs in ANOTHER document, and
    ``dup_bp = 10000 * dup_spans // n_spans`` (basis points, exact)."""
    from ray.data.aggregate import Sum

    from .dedup import _SHINGLE_MIX, _token_hash
    from .groupscan import scan_sorted_groups
    from .join import hash_join

    def span_rows(df: pd.DataFrame) -> pd.DataFrame:
        docs_out, spans_out, cnt_out = [], [], []
        for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
            toks = text.split()
            n = len(toks)
            if n < k:
                continue
            th = np.fromiter((_token_hash(t) for t in toks),
                             dtype=np.uint64, count=n)
            h = np.zeros(n - k + 1, dtype=np.uint64)
            for j in range(k):  # position-dependent mix (ops/dedup)
                h ^= (th[j: n - k + 1 + j] * _SHINGLE_MIX) << np.uint64(j)
            uniq, cnt = np.unique(h, return_counts=True)
            docs_out.append(np.full(len(uniq), int(doc_id),
                                    dtype=np.int64))
            spans_out.append(uniq.view(np.int64))
            cnt_out.append(cnt.astype(np.int64))
        if not docs_out:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "span": pd.Series(dtype="int64"),
                                 "cnt": pd.Series(dtype="int64")})
        return pd.DataFrame({id_col: np.concatenate(docs_out),
                             "span": np.concatenate(spans_out),
                             "cnt": np.concatenate(cnt_out)})

    rows = (docs_ds.map_batches(span_rows, batch_format="pandas")
            .materialize())

    out_empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              "cnt": pd.Series(dtype="int64")})

    def keep_shared(g: pd.DataFrame) -> pd.DataFrame:
        # only reached with len(g) >= 2 (min_group) — every row of a
        # shared-span segment is one (doc, positions) contribution
        return g[[id_col, "cnt"]]

    def block_keep(df: pd.DataFrame, starts: np.ndarray,
                   ends: np.ndarray) -> pd.DataFrame:
        sizes = ends - starts
        total = int(sizes.sum())
        cum_excl = np.cumsum(sizes) - sizes
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(cum_excl, sizes) + np.repeat(starts, sizes))
        return pd.DataFrame({id_col: df[id_col].to_numpy()[idx],
                             "cnt": df["cnt"].to_numpy()[idx]})

    shared = scan_sorted_groups(rows, "span", keep_shared, out_empty,
                                min_group=2, block_fn=block_keep)
    dup = shared.groupby(id_col).aggregate(
        Sum("cnt", alias_name="dup_spans"))
    tot = rows.groupby(id_col).aggregate(
        Sum("cnt", alias_name="n_spans"))
    joined = hash_join(tot, dup, on=id_col, how="left_outer")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_spans"].to_numpy(dtype=np.int64)
        d = np.nan_to_num(
            df["dup_spans"].to_numpy(dtype=np.float64)).astype(np.int64)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_spans": n, "dup_spans": d,
                             "dup_bp": 10_000 * d // n})

    return joined.map_batches(finish, batch_format="pandas")
