"""Within-document repetition census — the Gopher-rules quality
filter (Rae et al. 2021, "Scaling Language Models") that screens
boilerplate and spam by how much of a document is the SAME phrase
repeated: per document, the total bigram count and the count of the
most frequent bigram (``top_bigram_n / n_bigrams`` is the "top-2-gram
fraction" rule; exact integers here so any threshold is
layout-deterministic).

Fully vectorized per block (no per-row Python): ONE Arrow RE2
``split_pattern_regex`` over the whole column → flat token array +
row ids → ``np.unique`` token codes → adjacent-pair bigram codes
within row boundaries → lexsort run-length counts → per-row
``maximum.at``.  Embarrassingly parallel; nothing shuffles.

Tokens are ``\\S+`` runs (the `text.token_count` convention), so the
DuckDB oracle (`q185`) is ``regexp_extract_all(text, '\\S+')`` +
LEAD-window bigrams — byte-identical semantics because tokens cannot
contain the join character.

Outputs per document: ``n_tokens``, ``n_bigrams``
(= max(n_tokens-1, 0)), ``top_bigram_n`` (0 when no bigrams).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _block(b: pa.Table, id_col: str, text_col: str) -> pd.DataFrame:
    t = pc.fill_null(b[text_col].cast(pa.string()), "")
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    toks = pc.split_pattern_regex(t, r"\s+")
    n = len(toks)
    lengths = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    row = np.repeat(np.arange(n, dtype=np.int64), lengths)
    keep = flat != ""  # split artifacts at string edges
    flat, row = flat[keep], row[keep]

    n_tokens = np.bincount(row, minlength=n).astype(np.int64)
    top = np.zeros(n, dtype=np.int64)
    n_bigrams = np.zeros(n, dtype=np.int64)
    if len(flat) > 1:
        _, codes = np.unique(flat, return_inverse=True)
        codes = codes.astype(np.int64)
        adj = row[1:] == row[:-1]
        bg_row = row[:-1][adj]
        v = int(codes.max()) + 1
        bg = codes[:-1][adj] * v + codes[1:][adj]
        n_bigrams = np.bincount(bg_row, minlength=n).astype(np.int64)
        if len(bg):
            order = np.lexsort((bg, bg_row))
            r2, g2 = bg_row[order], bg[order]
            new = np.ones(len(r2), dtype=bool)
            new[1:] = (r2[1:] != r2[:-1]) | (g2[1:] != g2[:-1])
            cnt = np.bincount(np.cumsum(new) - 1).astype(np.int64)
            np.maximum.at(top, r2[new], cnt)

    return pd.DataFrame({
        id_col: b[id_col].to_numpy(zero_copy_only=False),
        "n_tokens": n_tokens,
        "n_bigrams": n_bigrams,
        "top_bigram_n": top,
    })


def bigram_repetition(ds, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Dataset of (id, n_tokens, n_bigrams, top_bigram_n) rows."""
    return ds.map_batches(
        lambda b: _block(b, id_col, text_col), batch_format="pyarrow")
