"""Token explode / unnest — the row-multiplying transform (one row per
list element) plus the combined explode→count that a corpus-statistics
pass actually wants at scale.

Ray-Data-first plan: :func:`explode_tokens` is a pure ``map_batches``
row multiplier (Arrow ``list_flatten`` + ``list_parent_indices`` gather
— no Python loop over rows, no shuffle; block sizes grow by the fan-out
factor so callers chain ``repartition`` only if the next stage needs
it).  :func:`token_counts` NEVER materializes the exploded stream: a
per-block combiner counts tokens inside each block (``value_counts`` on
the flattened Arrow array), so the hash ``groupby`` that follows moves
one ``(token, partial_n)`` row per distinct token per block — corpus
positions never leave their block.  At 10^12 documents the exchange is
vocabulary-sized × blocks, not token-stream-sized.

RAQC analog: none (SURVEY §2 — the reference has no list/unnest ops);
part of the §2 "large-scale training-data pipeline" surface (vocab
building, stopword audits, n-gram corpus stats).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def explode_tokens(ds, id_col: str, text_col: str, sep: str = " ",
                   token_col: str = "token", pos_col: str = "pos",
                   drop_empty: bool = True):
    """One output row per token: ``(id_col, pos_col, token_col)`` with
    ``pos`` the 0-based token position within its document.  Matches
    SQL ``unnest(string_split(text, sep))`` (empty tokens from repeated
    separators are dropped when ``drop_empty``, which also matches the
    oracle's ``WHERE token <> ''``)."""

    def fn(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], sep)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        # 0-based position within each list: global index minus the
        # parent list's offset (vectorized via the list offsets)
        import numpy as np

        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(len(flat), dtype=np.int64) - starts[
            parent.to_numpy(zero_copy_only=False)]
        ids = pc.take(b[id_col], parent)
        out = pa.table({id_col: ids, pos_col: pa.array(pos),
                        token_col: flat})
        if drop_empty:
            out = out.filter(pc.not_equal(out[token_col], ""))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def token_counts(ds, text_col: str, sep: str = " ",
                 token_col: str = "token", count_col: str = "n",
                 min_count: int = 1):
    """Global token frequency table ``(token, n)`` without ever
    shuffling the exploded token stream: per-block ``value_counts``
    partials → hash groupby SUM over (vocab × blocks) rows."""
    from ray.data.aggregate import Sum

    def block_counts(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(b[text_col], sep))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({token_col: vc.field("values"),
                         count_col: pc.cast(vc.field("counts"), pa.int64())})

    partial = ds.map_batches(block_counts, batch_format="pyarrow")
    out = (partial.groupby(token_col)
           .aggregate(Sum(count_col, alias_name=count_col)))
    if min_count > 1:
        out = out.filter(expr=f"{count_col} >= {min_count}")
    return out.select_columns([token_col, count_col])


def grouped_token_counts(ds, key: str, text_col: str, sep: str = " ",
                         token_col: str = "token", count_col: str = "n"):
    """Per-key token frequency table ``(key, token, n)`` — the
    corpus-statistics pass behind per-source vocabularies and top-terms
    reports.  Same never-materialize-the-explosion plan as
    :func:`token_counts`: the per-block combiner counts (key, token)
    pairs inside the block (Arrow flatten + parent-index gather, one
    vectorized pandas groupby), so the hash groupby moves
    per-block-vocabulary-sized partials, never the token stream."""
    from ray.data.aggregate import Sum

    def block_counts(b: pa.Table):
        toks = pc.split_pattern(b[text_col], sep)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        t = pa.table({key: pc.take(b[key], parent), token_col: flat})
        t = t.filter(pc.not_equal(t[token_col], ""))
        return (t.to_pandas()
                .groupby([key, token_col], sort=False)
                .size().reset_index(name=count_col))

    partial = ds.map_batches(block_counts, batch_format="pyarrow")
    return (partial.groupby([key, token_col])
            .aggregate(Sum(count_col, alias_name=count_col)))


def tfidf_terms(ds, key: str, id_col: str, text_col: str,
                sep: str = " ", round_to: int = 6):
    """Per-key TF-IDF term table ``(key, token, tf, df, tfidf)`` —
    distinctive-term extraction over a sharded corpus.

    Three exact distributed passes, none of which shuffles the token
    stream: tf via :func:`grouped_token_counts` (per-block combiner),
    df via the block-dedup exact COUNT(DISTINCT doc) plan
    (:func:`raqc_ray.ops.distinct.grouped_count_distinct` over the
    exploded (doc, token) pairs), and the corpus size is one Count.
    tf ⋈ df is a vocabulary-sized hash join
    (:func:`raqc_ray.ops.join.hash_join` — distributed, no broadcast
    assumption on vocabulary size).  ``tfidf = tf · ln(n_docs/df)``
    from exact int64 inputs, rounded to ``round_to`` to absorb libm
    last-ulp differences vs the SQL oracle."""
    from ..ops.distinct import grouped_count_distinct
    from ..ops.join import hash_join

    n_docs = ds.count()
    tf = grouped_token_counts(ds, key, text_col, sep=sep,
                              token_col="token", count_col="tf")
    exploded = explode_tokens(ds, id_col, text_col, sep=sep,
                              token_col="token").select_columns(
                                  [id_col, "token"])
    dft = grouped_count_distinct(exploded, "token", id_col, out_col="df")
    joined = hash_join(tf, dft, on="token")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tfv = df["tf"].to_numpy(dtype=np.float64)
        dfv = df["df"].to_numpy(dtype=np.float64)
        out = df[[key, "token"]].copy()
        out["tf"] = df["tf"].astype("int64")
        out["df"] = df["df"].astype("int64")
        out["tfidf"] = np.round(tfv * np.log(float(n_docs) / dfv),
                                round_to)
        return out

    return joined.map_batches(finish, batch_format="pandas")


def posting_lists(ds, id_col: str, text_col: str, sep: str = " ",
                  min_df: int = 1, max_df: int | None = None,
                  token_col: str = "token"):
    """Inverted index: one row ``(token, df, postings)`` per surviving
    token, where ``df`` is the exact document frequency and
    ``postings`` the comma-joined ASCENDING doc-id list — the retrieval
    artifact a corpus-search / contamination-audit stage hands off.

    Plan: per-block DISTINCT ``(token, id)`` carriers (block-local
    dedup — the token stream itself never shuffles), ONE hash exchange
    partitioned by token via the sorted-block scan, vectorized
    per-token assembly (cross-block duplicate carriers collapsed with
    ``np.unique`` inside the group).  ``min_df``/``max_df`` drop rare /
    stopword-scale postings at assembly time, BEFORE any list is
    built, so a 10^12-doc stopword never assembles a doc-id string —
    at corpus scale pair ``max_df`` with the heavy-hitters screen to
    budget the index.  Matches SQL ``string_agg(... ORDER BY id)`` +
    ``HAVING COUNT(DISTINCT id) BETWEEN``."""
    from .groupscan import scan_sorted_groups

    def carriers(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], sep)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = pc.take(b[id_col], parent)
        t = pa.table({token_col: flat, id_col: ids})
        t = t.filter(pc.not_equal(t[token_col], ""))
        # block-local dedup: (token, id) repeats within a doc collapse
        # here; cross-block repeats collapse in the group scan
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    carr = ds.map_batches(carriers, batch_format="pyarrow")
    lo, hi = min_df, max_df if max_df is not None else np.iinfo(np.int64).max

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy(dtype=np.int64))
        if not (lo <= len(ids) <= hi):
            return pd.DataFrame({token_col: pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64"),
                                 "postings": pd.Series(dtype="object")})
        return pd.DataFrame({token_col: [g[token_col].iloc[0]],
                             "df": [np.int64(len(ids))],
                             "postings": [",".join(map(str, ids))]})

    empty = pd.DataFrame({token_col: pd.Series(dtype="object"),
                          "df": pd.Series(dtype="int64"),
                          "postings": pd.Series(dtype="object")})
    return scan_sorted_groups(carr, token_col, assemble, empty,
                              min_group=1)
