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


# Real language ID lives in ops/langid.py (26-language char-n-gram
# scorer, script-gated, vectorized across the batch); re-exported here
# under the original name so existing pipelines keep working.
from .langid import TrigramLangId as LangId  # noqa: E402


def rolling_fingerprint(df: pd.DataFrame, text_col: str = "text", k: int = 16
                        ) -> pd.DataFrame:
    """Rolling-hash document fingerprint: min of Karp-Rabin hashes over
    k-byte windows (a winnowing-lite signature; robust to small edits).

    Fully vectorized across the BATCH: all docs' UTF-8 bytes concatenate
    into one buffer; window hashes are k shifted multiply-adds over it
    (window [i, i+k) = Σ_j byte[i+j]·B^{k-1-j} mod M — algebraically the
    old prefix-hash form, no per-byte Python); per-doc minima come from
    one ``np.minimum.reduceat``.  Windows spanning a doc boundary are
    masked to the modulus sentinel (> any hash) before the reduce.
    """
    # Mersenne-prime modulus kept below 2^31: byte (2^8) × weight (2^31)
    # products are < 2^39, and k=16 of them sum below 2^43 — no overflow.
    B, M = np.uint64(257), np.uint64((1 << 31) - 1)
    enc = [s.encode("utf-8") for s in df[text_col].fillna("")]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    fp = np.zeros(len(enc), dtype=np.uint64)

    # weights B^{k-1} … B^0 mod M (tiny: k entries)
    w = np.empty(k, dtype=np.uint64)
    w[-1] = 1
    for j in range(k - 2, -1, -1):
        w[j] = (w[j + 1] * B) % M

    long_idx = np.flatnonzero(lens >= k)
    if long_idx.size:
        buf = np.frombuffer(b"".join(enc[i] for i in long_idx), dtype=np.uint8
                            ).astype(np.uint64)
        llens = lens[long_idx]
        offs = np.concatenate([[0], np.cumsum(llens)[:-1]])
        nwin = len(buf) - k + 1
        h = np.zeros(nwin, dtype=np.uint64)
        for j in range(k):
            h += buf[j : nwin + j] * w[j]
        h %= M
        # mask the k-1 boundary-spanning window starts at each doc's tail
        ends = offs + llens
        bad = (np.repeat(ends - (k - 1), k - 1)
               + np.tile(np.arange(k - 1, dtype=np.int64), len(ends)))
        bad = bad[(bad >= 0) & (bad < nwin)]
        h[bad] = M  # sentinel: strictly greater than any hash (< M)
        fp[long_idx] = np.minimum.reduceat(h, np.minimum(offs, nwin - 1))

    # short docs (< k bytes): Horner over all bytes — h = Σ b_j·B^{n-1-j}
    # mod M, i.e. the weight tail w[k-n:] (w[k-1-j] = B^j)
    for i in np.flatnonzero(lens < k):
        b = np.frombuffer(enc[i], dtype=np.uint8).astype(np.uint64)
        fp[i] = (b * w[k - len(b):]).sum() % M if len(b) else np.uint64(0)
    return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                         "fp_rolling": fp.astype("int64")})


#: GPT-2-style pre-tokenizer pattern (public knowledge; Radford et al.
#: 2019 release) minus the lookahead RE2 doesn't support — contractions,
#: letter runs, digit runs, punctuation runs, whitespace runs.  RE2 on
#: both pyarrow and DuckDB, so engine and oracle count identically.
BPE_SPLIT_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d"
                     r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_count(ds, id_col: str, text_col: str,
                    out_col: str = "n_bpe_tokens"):
    """Per-doc BPE-ish token count: non-overlapping matches of
    :data:`BPE_SPLIT_PATTERN` over the Arrow UTF-8 buffer — ONE
    ``pc.count_substring_regex`` kernel per block, zero Python per row.
    The whitespace `token_count` underestimates code/punctuation-heavy
    text; this matches what a GPT-2-family tokenizer's pre-split would
    produce and is the standard corpus-size estimate."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            out_col: pc.cast(
                pc.count_substring_regex(b[text_col],
                                         pattern=BPE_SPLIT_PATTERN),
                pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def type_token_ratio(ds, id_col: str = "doc_id", text_col: str = "text",
                     scale: int = 1_000_000):
    """Per-document lexical diversity — ``(id_col, n_tokens,
    n_distinct, ttr)`` with ``ttr = (n_distinct * scale) // n_tokens``
    (the Gopher-style type-token-ratio quality signal, complementing
    the within-document repetition ratio).

    Entirely document-local: one vectorized ``map_batches`` pass
    (arrow split + parent-index gather, a single pandas groupby per
    block), NO shuffle of any kind.  Tokenization is the engine-wide
    space-split-drop-empties contract; the scaled ratio is positive
    int64 ``//``, bit-identical to the SQL oracle.  Documents with
    zero tokens emit no row (SQL GROUP BY semantics)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def block(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        words = flat.to_numpy(zero_copy_only=False)[keep]
        parent = parent[keep]
        if not len(words):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "n_distinct": pd.Series(dtype="int64"),
                                 "ttr": pd.Series(dtype="int64")})
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = pd.DataFrame({id_col: ids[parent], "w": words})
        g = d.groupby(id_col, sort=False)["w"].agg(["size", "nunique"])
        n_tok = g["size"].to_numpy(dtype=np.int64)
        n_dis = g["nunique"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            id_col: g.index.to_numpy(dtype=np.int64),
            "n_tokens": n_tok,
            "n_distinct": n_dis,
            "ttr": (n_dis * int(scale)) // n_tok,
        })

    return ds.map_batches(block, batch_format="pyarrow")
