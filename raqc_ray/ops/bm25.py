"""BM25 ranked retrieval — Okapi BM25 top-k scoring of a corpus
against a small fixed query-term set (Robertson & Zaragoza, FnTIR
2009; the Lucene ``+1``-inside-``LN`` idf so scores stay positive).

Ray-Data-first plan, two streaming passes, neither of which shuffles
the token stream:

1. **Constants pass** — ONE ``map_batches`` collapses each block to a
   handful of partial rows: per query term the number of block docs
   containing it (df partial), plus sentinel rows carrying the block's
   total non-empty token count (Σdl partial) and doc count.  A
   query-terms-sized hash ``groupby`` sums them; the result is
   driver-tiny by construction (|query| + 2 rows).
2. **Scoring pass** — the constants broadcast into a second
   ``map_batches``: per doc, tf of each query term (Arrow ``is_in``
   restriction → unique-pair counts, vectorized) and the BM25 sum.
   Docs matching no term emit nothing, so the scored stream is
   matching-docs-sized; the global top-k is a ``sort().limit(k)``
   over that reduced stream.

Determinism: tf / df / dl / N / Σdl are exact int64; the float
epilogue uses the SAME expression shape as the SQL oracle
(``LN(1 + (n − df + ½)/(df + ½))``, ``b·dl·n/Σdl`` left-associated)
and the score is rounded to ``round_to`` before the (score DESC,
id ASC) order, so engine and oracle rank identically.

RAQC analog: none in SURVEY §2 — §2 training-data surface (relevance
retrieval over a sharded corpus; the ranked complement of the TF-IDF
term table `ops/unnest.tfidf_terms`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def bm25_topk(ds, id_col: str, text_col: str, query_terms,
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              sep: str = " ", round_to: int = 6):
    """Top-``k`` Dataset ``(id_col, score)`` of BM25 relevance of each
    document's ``text_col`` to ``query_terms``, ordered (score DESC,
    id ASC); ``score`` rounded to ``round_to``.  Tokenization matches
    the corpus convention: split on ``sep``, empty tokens dropped."""
    terms = sorted(set(query_terms))
    term_arr = pa.array(terms)

    def block_consts(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t[text_col], sep)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        nonempty = pc.not_equal(flat, "")
        total_dl = int(pc.sum(pc.cast(nonempty, pa.int64())).as_py() or 0)
        hit = pc.and_(nonempty, pc.is_in(flat, value_set=term_arr))
        ht = flat.filter(hit).to_numpy(zero_copy_only=False)
        hp = parent.to_numpy(zero_copy_only=False)[
            hit.to_numpy(zero_copy_only=False)]
        # df partial: distinct docs per term inside this block
        if len(ht):
            pairs = pd.DataFrame({"term": ht, "doc": hp})
            dfp = (pairs.drop_duplicates().groupby("term", sort=False)
                   .size().reset_index(name="df_part"))
        else:
            dfp = pd.DataFrame({"term": pd.Series(dtype="object"),
                                "df_part": pd.Series(dtype="int64")})
        dfp["dl_part"] = np.zeros(len(dfp), dtype=np.int64)
        dfp["doc_part"] = np.zeros(len(dfp), dtype=np.int64)
        sent = pd.DataFrame({"term": ["\x00total"],
                             "df_part": np.array([0], dtype=np.int64),
                             "dl_part": np.array([total_dl], dtype=np.int64),
                             "doc_part": np.array([t.num_rows], dtype=np.int64)})
        return pd.concat([dfp, sent], ignore_index=True)

    from ray.data.aggregate import Sum

    consts = (ds.map_batches(block_consts, batch_format="pyarrow")
              .groupby("term")
              .aggregate(Sum("df_part", alias_name="df"),
                         Sum("dl_part", alias_name="dl"),
                         Sum("doc_part", alias_name="docs"))
              .to_pandas())  # |query|+1 rows — tiny by construction
    tot = consts[consts["term"] == "\x00total"]
    n_docs = float(int(tot["docs"].iloc[0]))
    total_dl = float(int(tot["dl"].iloc[0]))
    df_map = {r["term"]: float(int(r["df"]))
              for _, r in consts.iterrows() if r["term"] in set(terms)}
    # idf per term, mirroring the oracle's expression shape
    idf = {t: float(np.log(1.0 + (n_docs - df_map.get(t, 0.0) + 0.5)
                           / (df_map.get(t, 0.0) + 0.5)))
           for t in terms}

    def score_block(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t[text_col], sep)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ne = pc.not_equal(flat, "")
        ne_np = ne.to_numpy(zero_copy_only=False)
        par_np = parent.to_numpy(zero_copy_only=False)
        ndoc = t.num_rows
        dl = np.bincount(par_np[ne_np], minlength=ndoc).astype(np.int64)
        hit = pc.and_(ne, pc.is_in(flat, value_set=term_arr))
        hit_np = hit.to_numpy(zero_copy_only=False)
        if not hit_np.any():
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        ht = flat.filter(hit).to_numpy(zero_copy_only=False)
        hp = par_np[hit_np]
        pairs = pd.DataFrame({"doc": hp, "term": ht})
        tf = (pairs.groupby(["doc", "term"], sort=False)
              .size().reset_index(name="tf"))
        dlv = dl[tf["doc"].to_numpy()].astype(np.float64)
        tfv = tf["tf"].to_numpy(dtype=np.float64)
        idfv = tf["term"].map(idf).to_numpy(dtype=np.float64)
        part = idfv * (tfv * (k1 + 1.0)) / (
            tfv + k1 * (1.0 - b + b * dlv * n_docs / total_dl))
        sc = pd.DataFrame({"doc": tf["doc"].to_numpy(), "s": part})
        agg = sc.groupby("doc", sort=True)["s"].sum()
        ids = t[id_col].to_numpy(zero_copy_only=False)[
            agg.index.to_numpy()]
        return pd.DataFrame({id_col: ids,
                             "score": np.round(agg.to_numpy(), round_to)})

    scored = ds.map_batches(score_block, batch_format="pyarrow")
    return scored.sort(["score", id_col],
                       descending=[True, False]).limit(k)


def rrf_fuse(rankings, id_col: str, k: int = 10, c: int = 60,
             scale: int = 10 ** 12):
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    of already-ORDERED top-N result lists: item score =
    ``Σ_lists scale // (c + rank)`` in exact int64 (``scale //`` keeps
    the classic 1/(c+rank) ordering while staying float-free /
    hash-stable), missing-from-a-list contributes 0; output is the
    top-``k`` by (rrf DESC, id ASC).

    Inputs are top-N Datasets (e.g. :func:`bm25_topk` results, ANN
    top-k lists) — RANKING-sized by construction, so the fusion is a
    driver-side merge by contract (documented; the N·|lists| rows are
    the violation-sized regime, never corpus-sized).  Rank is the
    1-based position in each list's existing order."""
    out_rows = {}
    for r in rankings:
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        ids = df[id_col].to_numpy()
        for rank, i in enumerate(ids, start=1):
            out_rows[i] = out_rows.get(i, 0) + scale // (c + rank)
    out = pd.DataFrame({id_col: list(out_rows.keys()),
                        "rrf": np.array(list(out_rows.values()),
                                        dtype=np.int64)})
    out = (out.sort_values(["rrf", id_col], ascending=[False, True],
                           kind="mergesort").head(k)
           .reset_index(drop=True))
    import ray.data as rd

    return rd.from_pandas(out)
