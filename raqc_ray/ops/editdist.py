"""Blocked edit-distance similarity join — Levenshtein ≤ k pairs over a
caller-supplied blocking key (the classic blocking-based fuzzy-dedup
primitive: block on a cheap key, verify candidates with the exact
metric; only candidate pairs are ever compared, never the corpus).

Ray-Data-first plan: project ``(id, block key, prefix)`` at the read,
ONE ``sort`` by the blocking key
(:func:`raqc_ray.ops.groupscan.scan_sorted_groups`), then per sorted
block a BATCHED dynamic program verifies every candidate pair of every
segment in one numpy pass: pair indices are the per-segment upper
triangles, the DP table is computed for ALL pairs simultaneously
(shape ``n_pairs × (P+1)`` rows, one vectorized inner loop over the
≤ P character positions — no per-pair Python).  Distances are exact
Levenshtein over the fixed-length prefix, matching a SQL
``levenshtein(substr(...))`` oracle bit-for-bit.

Partitioning assumption (documented per SURVEY.md "custom operators"):
the blocking key bounds group size — candidate verification is O(g²)
per group by definition of a similarity join.  ``max_group`` fails fast
on a hot block instead of silently going quadratic (same contract
family as ``NearDupCheck.hot_bucket_cap`` / cooc ``max_distinct``);
re-block with a finer key when it trips.

RAQC analog: none (SURVEY §2 has no string-similarity ops); part of
the §2 LLM-pipeline dedup surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupscan import scan_sorted_groups


def _batched_levenshtein(sa: np.ndarray, sb: np.ndarray,
                         la: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Exact Levenshtein distances for n pairs of codepoint rows.

    ``sa``/``sb``: uint32 arrays (n, P) zero-padded; ``la``/``lb``:
    true lengths.  One DP row per character position, vectorized
    across all pairs."""
    n, P = sa.shape
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    dist = np.zeros(n, dtype=np.int64)
    prev = np.tile(np.arange(P + 1, dtype=np.int64), (n, 1))
    # pairs with an empty A string finish at row 0
    done0 = la == 0
    if done0.any():
        dist[done0] = lb[done0]
    for i in range(1, int(la.max()) + 1 if n else 0):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = sa[:, i - 1][:, None]          # (n, 1)
        cost = (ai != sb).astype(np.int64)  # (n, P)
        for j in range(1, P + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1])
        at = la == i
        if at.any():
            dist[at] = cur[at, lb[at]]
        prev = cur
    return dist


def _encode(texts: pd.Series, prefix_len: int):
    """(codepoint matrix (n, P) uint32, lengths) for the first
    ``prefix_len`` CHARACTERS of each string — the DP compares
    codepoints, matching SQL ``substr`` semantics on character (not
    byte) prefixes.  Vectorized: pandas C-path slice/pad, one utf-32
    decode of the concatenated column, no per-row Python."""
    n = len(texts)
    sliced = texts.astype(str).str.slice(0, prefix_len)
    lens = sliced.str.len().to_numpy(dtype=np.int64)
    padded = sliced.str.ljust(prefix_len, "\x00")
    buf = "".join(padded.tolist()).encode("utf-32-le")
    mat = np.frombuffer(buf, dtype=np.uint32).reshape(n, prefix_len)
    return mat, lens


def blocked_editdist_pairs(ds, id_col: str, text_col: str, block_key: str,
                           max_dist: int, prefix_len: int = 24,
                           max_group: int = 10_000):
    """Dataset ``(a, b, dist)`` of id pairs (``a < b``) sharing
    ``block_key`` whose ``prefix_len``-character prefixes of
    ``text_col`` are within Levenshtein distance ``max_dist``."""
    proj = ds.select_columns([id_col, text_col, block_key])

    out_empty = pd.DataFrame({
        "a": pd.Series(dtype="int64"),
        "b": pd.Series(dtype="int64"),
        "dist": pd.Series(dtype="int64"),
    })

    def _verify(s: pd.DataFrame, starts: np.ndarray,
                ends: np.ndarray) -> pd.DataFrame:
        sizes = ends - starts
        if (sizes > max_group).any():
            hot = int(sizes.max())
            raise ValueError(
                f"blocked_editdist_pairs: blocking group of {hot} rows "
                f"exceeds max_group={max_group}; use a finer block key")
        ia_parts, ib_parts = [], []
        for st, en in zip(starts.tolist(), ends.tolist()):
            iu, ju = np.triu_indices(en - st, k=1)
            ia_parts.append(iu + st)
            ib_parts.append(ju + st)
        ia = np.concatenate(ia_parts) if ia_parts else np.zeros(0, np.int64)
        ib = np.concatenate(ib_parts) if ib_parts else np.zeros(0, np.int64)
        if len(ia) == 0:
            return out_empty.copy()
        mat, lens = _encode(s[text_col].reset_index(drop=True), prefix_len)
        ids = s[id_col].to_numpy(dtype=np.int64)
        # quick reject: length difference alone exceeds the threshold
        keep = np.abs(lens[ia] - lens[ib]) <= max_dist
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return out_empty.copy()
        d = _batched_levenshtein(mat[ia], mat[ib], lens[ia], lens[ib])
        ok = d <= max_dist
        a = ids[ia[ok]]
        b = ids[ib[ok]]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi, "dist": d[ok]})

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        return _verify(g.reset_index(drop=True),
                       np.array([0], dtype=np.int64),
                       np.array([len(g)], dtype=np.int64))

    def block_fn(interior: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        return _verify(interior, starts, ends)

    return scan_sorted_groups(proj, block_key, group_fn, out_empty,
                              min_group=2, block_fn=block_fn)
