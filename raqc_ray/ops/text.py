"""Text-analysis operators for large-scale training-data pipelines.

All operators are vectorized ``map_batches`` bodies over the ``documents``
table (``doc_id:int64, text:string, lang:string, source:string,
n_chars:int64``).  Stateful pieces (compiled regexes, stopword tables) live
in callable classes — built once per actor, used per batch.

These have no RAQC analog (the reference validates rasters); they are the
text-payload counterparts of its per-pixel masks, mandated by the task
brief's training-data-pipeline requirements.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"\S+")
WORD_RE = re.compile(r"[a-zA-Z']+")
# tiny per-language stopword tables for the n-gram/stopword language heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "ein", "nicht", "mit", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "un", "una", "es", "por"},
}
_PUNCT_RE = re.compile(r"[^\w\s]")


def token_count(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """doc_id + n_tokens (count of \\S+ runs — matches the DuckDB oracle
    ``length(regexp_extract_all(text, '\\S+'))``)."""
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["n_tokens"] = (
        df[text_col].fillna("").map(lambda s: len(TOKEN_RE.findall(s))).astype("int64")
    )
    return out


def fingerprint(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Deterministic content fingerprint: md5 hex of the UTF-8 text (matches
    DuckDB ``md5(text)``) — the exact-dup key at scale."""
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["fp"] = df[text_col].fillna("").map(
        lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
    )
    return out


class QualityScorer:
    """Quality-signal extraction (length / punctuation / stopword ratios).

    Actor-pool stage: regexes compiled once per actor in ``__init__``.
    """

    def __init__(self) -> None:
        self.token_re = re.compile(r"\S+")
        self.word_re = re.compile(r"[a-zA-Z']+")
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = _LANG_STOPWORDS["en"]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        n_chars = texts.str.len().astype("int64")
        n_tokens = texts.map(lambda s: len(self.token_re.findall(s))).astype("int64")
        n_punct = texts.map(lambda s: len(self.punct_re.findall(s))).astype("int64")
        words = texts.map(lambda s: [w.lower() for w in self.word_re.findall(s)])
        stop_ratio = words.map(
            lambda ws: (sum(w in self.stop for w in ws) / len(ws)) if ws else 0.0
        )
        mean_tok = (n_chars / n_tokens.replace(0, 1)).astype("float64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "punct_ratio": (n_punct / n_chars.replace(0, 1)).round(6),
                "stop_ratio": stop_ratio.astype("float64").round(6),
                "mean_token_len": mean_tok.round(6),
            }
        )


class LangId:
    """Stopword/character-n-gram language heuristic (en/de/fr/es/other)."""

    def __init__(self) -> None:
        self.word_re = re.compile(r"[a-zA-Z']+")
        self.tables = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def predict_one(self, s: str) -> str:
        ws = [w.lower() for w in self.word_re.findall(s or "")]
        if not ws:
            return "other"
        best, best_score = "other", 0
        for lang, table in self.tables.items():
            score = sum(w in table for w in ws)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0 else "other"

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang": df["lang"],
                "lang_pred": df["text"].map(self.predict_one),
            }
        )


def rolling_fingerprint(df: pd.DataFrame, text_col: str = "text", k: int = 16
                        ) -> pd.DataFrame:
    """Rolling-hash document fingerprint: min of Karp-Rabin hashes over
    k-byte windows (a winnowing-lite signature; robust to small edits)."""
    # Mersenne-prime modulus kept below 2^31 so vectorized uint64 products
    # (< 2^62) never overflow.
    B, M = np.uint64(257), np.uint64((1 << 31) - 1)
    out_ids, out_fp = [], []
    for doc_id, s in zip(df["doc_id"], df[text_col].fillna("")):
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < k:
            h = np.uint64(0)
            for x in b:
                h = (h * B + x) % M
            out_ids.append(doc_id)
            out_fp.append(int(h))
            continue
        # rolling windows via cumulative powers (vectorized)
        pw = np.ones(len(b), dtype=np.uint64)
        for i in range(1, len(b)):
            pw[i] = (pw[i - 1] * B) % M
        pref = np.zeros(len(b) + 1, dtype=np.uint64)
        for i, x in enumerate(b):
            pref[i + 1] = (pref[i] * B + x) % M
        # hash of window [i, i+k) = pref[i+k] - pref[i]*B^k
        bk = pw[k - 1] * B % M
        win = (pref[k:] + M - (pref[:-k] * bk) % M) % M
        out_ids.append(doc_id)
        out_fp.append(int(win.min()))
    return pd.DataFrame({"doc_id": out_ids, "fp_rolling": np.array(out_fp, dtype="uint64").astype("int64")})
