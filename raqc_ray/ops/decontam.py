"""Benchmark decontamination census — the eval-set n-gram overlap
check every serious LLM training pipeline runs before training
(GPT-3 appendix C / Brown et al. 2020: flag training documents
sharing k-gram spans with the benchmark; PaLM, Llama and the Pile do
the same with k≈8-13).  Output is one row per CONTAMINATED training
document: ``(id, n_shingles, n_overlap)`` — directly filterable
("drop docs overlapping the eval set").

Plan (scale shape):

1. **Benchmark pass** — the benchmark predicate selects the eval docs;
   each block emits its distinct shingle hashes and the driver unions
   them into ONE sorted uint64 array.  A benchmark is FIXED-SIZE by
   nature (thousands of eval documents, not corpus-scale), so the
   array is broadcast-sized BY CONTRACT — it ships once via
   ``ray.put`` and every scoring task binary-searches it zero-copy.
2. **Scoring pass** — ONE ``map_batches`` over the training docs:
   per doc the distinct shingle hashes (same tokenizer + k-gram mix
   as `ops/dedup` — q26's documented injective-hash-invariance
   contract, so the SQL oracle can group shingle TEXT), membership
   via ``np.searchsorted`` on the broadcast array, emit only docs
   with ≥ 1 overlap (violation-sized output).  The token stream
   never shuffles; there is NO join.

RAQC analog: none (SURVEY §2 LLM-dedup surface — the eval-leakage
complement of the corpus-internal q192 span census).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def contamination_census(docs_ds, id_col: str = "doc_id",
                         text_col: str = "text", bench_mod: int = 97,
                         k: int = 3):
    """One row per non-benchmark doc with ≥ 1 distinct k-token shingle
    also present in the benchmark (docs with ``id % bench_mod == 0``):
    ``(id_col, n_shingles, n_overlap)``.  Tokenization is whitespace
    ``str.split``; docs shorter than ``k`` tokens contribute their
    whole token list as one shingle (the q26 convention)."""
    import ray
    import ray.data as rd

    from .dedup import _shingle_hashes, _token_hash

    def doc_shingles(text: str) -> np.ndarray:
        toks = (text or "").split()
        if not toks:
            return np.array([], dtype=np.uint64)
        th = np.fromiter((_token_hash(t) for t in toks),
                         dtype=np.uint64, count=len(toks))
        return _shingle_hashes(th, k)

    def bench_block(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.int64)
        m = ids % bench_mod == 0
        parts = [doc_shingles(t) for t in df[text_col].to_numpy()[m]]
        if parts:
            u = np.unique(np.concatenate(parts))
        else:
            u = np.array([], dtype=np.uint64)
        return pd.DataFrame({"h": u})

    bench_parts = (docs_ds.map_batches(bench_block,
                                       batch_format="pandas")
                   .to_pandas())  # benchmark-sized by contract
    if "h" in bench_parts.columns and len(bench_parts):
        bench = np.unique(bench_parts["h"].to_numpy(dtype=np.uint64))
    else:  # no benchmark docs at all — nothing can be contaminated
        bench = np.array([], dtype=np.uint64)
    bench_ref = ray.put(bench)

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bench_ref)
        ids = df[id_col].to_numpy(dtype=np.int64)
        keep = ids % bench_mod != 0
        out_ids, out_n, out_ov = [], [], []
        for i, t in zip(ids[keep], df[text_col].to_numpy()[keep]):
            sh = doc_shingles(t)
            if not len(sh):
                continue
            pos = np.searchsorted(b, sh)
            pos = np.minimum(pos, len(b) - 1) if len(b) else pos
            ov = int((b[pos] == sh).sum()) if len(b) else 0
            if ov:
                out_ids.append(int(i))
                out_n.append(len(sh))
                out_ov.append(ov)
        return pd.DataFrame({
            id_col: np.array(out_ids, dtype=np.int64),
            "n_shingles": np.array(out_n, dtype=np.int64),
            "n_overlap": np.array(out_ov, dtype=np.int64),
        })

    return docs_ds.map_batches(score_block, batch_format="pandas")
