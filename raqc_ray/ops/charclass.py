"""Per-language character-class census — the script-consistency
screen: a corpus whose claimed language disagrees with its character
composition (digits-heavy "prose", space-free "English", Latin text
under a CJK tag) is mislabeled or machine-mangled, and the cheapest
detector is four exact codepoint-class counts per language bucket.

Exact integer contract: per (lang) totals of characters, digit
characters, spaces, and ASCII letters — pure counts, so the oracle is
``SUM(length(text) - length(regexp_replace(text, CLASS, '', 'g')))``
token-for-token (DuckDB ``length`` counts codepoints, as does
Python).

Vectorization: pandas ``.str.count`` regex kernels (compiled C over
the whole block — no per-row Python); per-block ``(lang, counts)``
partials collapse each block to <= n_langs rows before ONE tiny hash
groupby — the pre-aggregate-then-shuffle census discipline.

RAQC analog: A6's spirit (column stats) — SURVEY §2 training-data
surface, the composition sibling of langid (q16) and the quality
ratios (q15).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["charclass_census"]


def charclass_census(ds, key: str = "lang", text_col: str = "text"):
    """Dataset ``(key, n_chars, n_digit, n_space, n_alpha)`` — one
    int64 row per key (null texts count as empty)."""
    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("")
        d = pd.DataFrame({
            key: df[key],
            "n_chars": t.str.len().to_numpy(dtype=np.int64),
            "n_digit": t.str.count(r"[0-9]").to_numpy(dtype=np.int64),
            "n_space": t.str.count(" ").to_numpy(dtype=np.int64),
            "n_alpha": t.str.count(r"[A-Za-z]")
                        .to_numpy(dtype=np.int64),
        })
        return (d.groupby(key, sort=False, as_index=False).sum())

    return (ds.map_batches(partials, batch_format="pandas")
            .groupby(key)
            .aggregate(Sum("n_chars", alias_name="n_chars"),
                       Sum("n_digit", alias_name="n_digit"),
                       Sum("n_space", alias_name="n_space"),
                       Sum("n_alpha", alias_name="n_alpha")))
