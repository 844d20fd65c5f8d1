"""Corpus-hygiene operators for LLM training-data pipelines:
benchmark decontamination, within-document repetition scoring
(Gopher-style duplicate-n-gram fraction), and per-source n-gram
vocabulary statistics.

Ray-Data-first plans:

- :func:`contamination_hits` — the benchmark side (an eval/test set)
  is corpus-tiny by construction, so its distinct shingle set is built
  once and BROADCAST (``ray.put`` → read zero-copy in every task); the
  training corpus then streams through one ``map_batches`` membership
  test.  No shuffle of the corpus, ever — the exchange is
  benchmark-sized, which is the only shape that survives 10^12 docs.
- :func:`repetition_ratio` — a document's n-grams are a pure function
  of its own row, so the whole op is one vectorized ``map_batches``
  (flatten → shingle → per-parent bincount).  Embarrassingly parallel;
  nothing moves.
- :func:`distinct_ngrams_by_source` — per-block ``(source, shingle)``
  partial counts collapse duplicates BEFORE the hash exchange, so the
  shuffle moves one row per distinct (source, shingle) per block
  (vocabulary-sized × blocks), never the token stream — the same
  combiner discipline as ``unnest.token_counts``.

RAQC analog: none (SURVEY §2 — the reference has no text/corpus ops);
part of the §2 "large-scale training-data pipeline" surface
(decontamination per Brown et al. 2020 App. C / Dodge et al. 2021;
repetition filters per Rae et al. 2021 "Gopher" §A1.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def word_ngrams(col, n: int):
    """Vectorized word n-gram extraction from an Arrow string column.

    Returns ``(parent, shingles)``: int64 row indices into ``col`` and
    an object ndarray of space-joined n-gram strings.  Tokenization
    matches the SQL oracle exactly: split on single spaces, drop empty
    tokens (so runs of spaces behave like one), shingle over the
    FILTERED sequence — ``string_split(text,' ')`` + ``w <> ''`` +
    ``row_number()`` adjacency in DuckDB terms.
    """
    toks = pc.split_pattern(col, " ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    words = flat.to_numpy(zero_copy_only=False)[keep]
    parent = parent[keep]
    m = len(words) - n + 1
    if m <= 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=object)
    valid = parent[:m] == parent[n - 1:]
    # element-wise C-loop string concat (object dtype); no Python
    # per-row loop in this module
    s = pd.Series(words[:m], dtype=object)
    for j in range(1, n):
        s = s + " " + pd.Series(words[j:m + j], dtype=object)
    return parent[:m][valid], s.to_numpy()[valid]


def repetition_ratio(ds, id_col: str, text_col: str, n: int = 3,
                     round_to: int = 6):
    """Per-document duplicate-n-gram fraction — the Gopher §A1.1
    repetition signal.  Output: ``(id_col, n_ngrams, n_distinct,
    dup_frac)`` with ``dup_frac = round(1 - distinct/total, round_to)``;
    documents with fewer than ``n`` tokens emit no row (the SQL GROUP
    BY over zero shingles produces none).  Counts are exact int64 and
    the single division of two small ints is the same IEEE op the SQL
    engine performs — bit-stable under any block layout."""

    def fn(t: pa.Table) -> pa.Table:
        par, sh = word_ngrams(t[text_col], n)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = np.bincount(par, minlength=len(t))
        d = pd.DataFrame({"p": par, "s": sh}).drop_duplicates()
        dst = np.bincount(d["p"].to_numpy(), minlength=len(t))
        mask = tot > 0
        tot, dst = tot[mask].astype(np.int64), dst[mask].astype(np.int64)
        frac = np.round(1.0 - dst.astype(np.float64) / tot, round_to)
        return pa.table({id_col: ids[mask], "n_ngrams": tot,
                         "n_distinct": dst, "dup_frac": frac})

    return ds.map_batches(fn, batch_format="pyarrow")


def contamination_hits(docs_ds, bench_ds, id_col: str, text_col: str,
                       n: int = 5):
    """Benchmark decontamination: for every training document, the
    number of DISTINCT word ``n``-grams it shares with ``bench_ds``
    (the eval/benchmark corpus).  Output: ``(id_col, n_shared)`` for
    documents with ``n_shared > 0`` — the flag set a dedup/removal
    step consumes (GPT-3 App. C–style n-gram decontamination).

    ``bench_ds`` must be corpus-small (an eval set); its distinct
    shingle set is collected once and broadcast via ``ray.put`` — the
    training side streams, nothing corpus-sized shuffles.  Exact string
    comparison (no hashing) so the result is identical to the SQL
    string-equality oracle.
    """
    import ray

    def bench_shingles(t: pa.Table) -> pa.Table:
        _, sh = word_ngrams(t[text_col], n)
        return pa.table({"s": pd.unique(sh)})

    bench_parts = bench_ds.map_batches(
        bench_shingles, batch_format="pyarrow").to_pandas()
    bench_set = frozenset(bench_parts["s"].to_numpy())
    bench_ref = ray.put(bench_set)

    def score(t: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        par, sh = word_ngrams(t[text_col], n)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = pd.DataFrame({"p": par, "s": sh}).drop_duplicates()
        hit = d["s"].isin(bset).to_numpy()
        cnt = np.bincount(d["p"].to_numpy()[hit], minlength=len(t))
        mask = cnt > 0
        return pa.table({id_col: ids[mask],
                         "n_shared": cnt[mask].astype(np.int64)})

    return docs_ds.map_batches(score, batch_format="pyarrow")


def distinct_ngrams_by_source(ds, key: str, text_col: str, n: int = 5):
    """Per-``key`` n-gram vocabulary statistics: ``(key, n_ngrams,
    n_distinct)`` — total shingle occurrences and distinct shingles
    per group (vocabulary growth / dedup-potential profiling).

    One hash exchange of per-block ``(key, shingle, partial_n)`` rows
    — duplicates collapse inside each block first, so the shuffle is
    vocabulary-sized × blocks, not token-stream-sized.  All counts are
    associative int64 sums: layout-invariant, exact."""
    from ray.data.aggregate import Count, Sum

    def block_pairs(t: pa.Table) -> pa.Table:
        par, sh = word_ngrams(t[text_col], n)
        src = t[key].to_numpy(zero_copy_only=False)[par]
        d = (pd.DataFrame({key: src, "s": sh})
             .groupby([key, "s"], sort=False, as_index=False)
             .size().rename(columns={"size": "pn"}))
        return pa.Table.from_pandas(d, preserve_index=False)

    per_shingle = (ds.map_batches(block_pairs, batch_format="pyarrow")
                   .groupby([key, "s"])
                   .aggregate(Sum("pn", alias_name="cnt")))
    return (per_shingle.groupby(key)
            .aggregate(Sum("cnt", alias_name="n_ngrams"),
                       Count(alias_name="n_distinct")))


def adjacent_bigram_scores(ds, text_col: str, min_count: int = 5,
                           scale: int = 1_000_000):
    """Collocation mining with EXACT integer association scores:
    ``(w1, w2, c_xy, score)`` for adjacent word bigrams with ``c_xy >=
    min_count``, where ``score = (c_xy * N * scale) // (c_x * c_y)``
    — the PMI ratio ``p(x,y)/(p(x)p(y))`` scaled to an integer so the
    result is associative int64 arithmetic, bit-identical to the SQL
    oracle under any layout (no logs, no float sums).

    Plan: per-block bigram partial counts (the token stream never
    shuffles — same combiner discipline as ``unnest.token_counts``)
    → one vocabulary²-bounded hash aggregate → left/right marginals
    derived FROM the bigram table (two vocabulary-sized aggregates)
    → two hash joins of frequency tables, never of the corpus.

    int64 bound: ``max(c_xy) * N * scale < 2^63`` — holds to ~10^5
    docs/word × 10^12-bigram corpora at scale=10^6; past that swap the
    score arithmetic to int128/hugeint (the SQL side already can).
    """
    from ray.data.aggregate import Sum

    from .join import hash_join

    def block_bigrams(t: pa.Table) -> pa.Table:
        _, sh = word_ngrams(t[text_col], 2)
        if not len(sh):
            return pa.table({"s": pa.array([], type=pa.string()),
                             "pn": pa.array([], type=pa.int64())})
        d = (pd.DataFrame({"s": sh})
             .groupby("s", sort=False, as_index=False).size()
             .rename(columns={"size": "pn"}))
        return pa.Table.from_pandas(d, preserve_index=False)

    big = (ds.map_batches(block_bigrams, batch_format="pyarrow")
           .groupby("s")
           .aggregate(Sum("pn", alias_name="c_xy"))
           .materialize())  # three downstream reads of this lineage

    n_total = int(big.aggregate(Sum("c_xy", alias_name="n"))["n"])

    def split_words(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["s"].str.split(" ", n=1, expand=True)
        out = pd.DataFrame({"w1": parts[0], "w2": parts[1],
                            "c_xy": df["c_xy"].astype("int64")})
        return out

    bw = big.map_batches(split_words, batch_format="pandas")
    left = bw.groupby("w1").aggregate(Sum("c_xy", alias_name="c_x"))
    right = bw.groupby("w2").aggregate(Sum("c_xy", alias_name="c_y"))

    def frequent(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["c_xy"] >= min_count]

    j = hash_join(hash_join(bw.map_batches(frequent,
                                           batch_format="pandas"),
                            left, on="w1"),
                  right, on="w2")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["w1", "w2", "c_xy"]].copy()
        num = (df["c_xy"].to_numpy(dtype=np.int64) * n_total * scale)
        den = (df["c_x"].to_numpy(dtype=np.int64)
               * df["c_y"].to_numpy(dtype=np.int64))
        # all terms positive, so numpy floor-// == SQL trunc-//
        out["score"] = num // den
        return out

    return j.map_batches(score, batch_format="pandas")


def bigram_lm_scores(ds, id_col: str, text_col: str,
                     scale: int = 1_000_000):
    """Per-document bigram-LM fluency score — the CCNet-style
    "quality by language-model" filter, with EXACT integer arithmetic:

    ``lm_score(doc) = (Σ_i  (c(w_i, w_{i+1}) * scale) // c_left(w_i))
    // n_bigrams(doc)`` — the mean scaled conditional frequency
    ``p(w_{i+1} | w_i)`` of the document's adjacent bigrams under the
    corpus's own counts (``c_left`` = the bigram table's left
    marginal).  High = the document's word sequences are typical of
    the corpus; low = disfluent/garbled text.  All terms are positive
    int64 (``c_xy * scale < 2^63``) and integer division matches SQL
    ``//``, so the result is layout-invariant and hashes bit-identically
    to the DuckDB window+join oracle.

    Plan: bigram counts exactly as :func:`adjacent_bigram_scores`
    (per-block partials, ONE vocabulary²-bounded aggregate), the
    per-bigram value table ``v = (c_xy * scale) // c_x`` reduced on the
    driver (vocabulary-sized — the documented broadcast contract; at
    vocabularies past worker memory, swap the broadcast for a
    :func:`raqc_ray.ops.join.hash_join` of the exploded doc-bigram
    stream against the value table — same rows, one more shuffle),
    broadcast ONCE via ``ray.put``, then one streaming ``map_batches``
    over the corpus merges each block's bigrams against the shared
    table and reduces per document.  Documents with < 1 bigram emit no
    row (SQL inner-join semantics).
    """
    import ray
    from ray.data.aggregate import Sum

    def block_bigrams(t: pa.Table) -> pa.Table:
        _, sh = word_ngrams(t[text_col], 2)
        if not len(sh):
            return pa.table({"s": pa.array([], type=pa.string()),
                             "pn": pa.array([], type=pa.int64())})
        d = (pd.DataFrame({"s": sh})
             .groupby("s", sort=False, as_index=False).size()
             .rename(columns={"size": "pn"}))
        return pa.Table.from_pandas(d, preserve_index=False)

    big = (ds.map_batches(block_bigrams, batch_format="pyarrow")
           .groupby("s")
           .aggregate(Sum("pn", alias_name="c_xy"))
           .to_pandas())
    # vocabulary-sized driver reduce: left marginal + per-bigram value
    big["c_xy"] = big["c_xy"].astype("int64")
    w1 = big["s"].str.split(" ", n=1, expand=True)[0]
    c_x = big.groupby(w1, sort=False)["c_xy"].transform("sum").astype("int64")
    vtab = pd.DataFrame({
        "s": big["s"],
        "__v": (big["c_xy"].to_numpy(dtype=np.int64) * int(scale))
        // c_x.to_numpy(dtype=np.int64),
    })
    ref = ray.put(vtab)

    def score_block(t: pa.Table) -> pd.DataFrame:
        parent, sh = word_ngrams(t[text_col], 2)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(sh):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "n_bigrams": pd.Series(dtype="int64"),
                                 "lm_score": pd.Series(dtype="int64")})
        v = ray.get(ref)
        d = pd.DataFrame({id_col: ids[parent], "s": sh}).merge(v, on="s")
        g = d.groupby(id_col, sort=False)["__v"].agg(["sum", "size"])
        return pd.DataFrame({
            id_col: g.index.to_numpy(dtype=np.int64),
            "n_bigrams": g["size"].to_numpy(dtype=np.int64),
            "lm_score": (g["sum"].to_numpy(dtype=np.int64)
                         // g["size"].to_numpy(dtype=np.int64)),
        })

    return ds.map_batches(score_block, batch_format="pyarrow")


def source_vocab_drift(ds, key: str, text_col: str,
                       scale: int = 1_000_000):
    """Pairwise vocabulary-distribution drift between sources —
    ``(src_a, src_b, l1_dist)`` where ``l1_dist = Σ_w |p_a(w) −
    p_b(w)|`` over the union vocabulary and ``p_k(w) = (c_k(w) *
    scale) // n_k`` is the scaled-integer token frequency.  This is
    (2× scale ×) the total-variation distance between the sources'
    unigram distributions — the corpus-level drift screen an LLM data
    pipeline runs across shards/snapshots before mixing (the integer
    analog of the validation engine's PSI drift check, which needs
    logs and therefore floats).

    Plan: per-(key, token) exact counts via
    :func:`raqc_ray.ops.unnest.grouped_token_counts` (per-block
    combiner, the token stream never shuffles), per-key totals from
    block partials (a sources-sized broadcast), then ONE sorted-group
    scan co-locates each token's ≤K rows and a vectorized block pass
    scatters them into a (segments × K) matrix — all pairwise |p_a −
    p_b| partial sums per BLOCK, one tiny final groupby.  Everything
    is positive int64 with ``//`` floor = SQL trunc, so the result is
    layout-invariant and bit-identical to the SQL oracle.

    Partitioning assumption: sources are few (K ≤ hundreds — K² pair
    scalars per block); the vocabulary can be arbitrarily large.
    """
    from ray.data.aggregate import Sum

    from .groupscan import scan_sorted_groups
    from .unnest import grouped_token_counts

    counts = grouped_token_counts(ds, key, text_col).materialize()

    def block_totals(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    tot = (counts.map_batches(block_totals, batch_format="pandas")
           .groupby(key).aggregate(Sum("n", alias_name="n")).to_pandas())
    totals = {k: int(v) for k, v in zip(tot[key], tot["n"])}
    skeys = sorted(totals)
    kpos = {k: i for i, k in enumerate(skeys)}
    K = len(skeys)

    out_empty = pd.DataFrame({
        "src_a": pd.Series(dtype="object"),
        "src_b": pd.Series(dtype="object"),
        "l1_dist": pd.Series(dtype="int64"),
    })

    def pair_rows(M: np.ndarray) -> pd.DataFrame:
        rows_a, rows_b, rows_d = [], [], []
        for i in range(K):
            for j in range(i + 1, K):
                d = int(np.abs(M[:, i] - M[:, j]).sum())
                if d:
                    rows_a.append(skeys[i])
                    rows_b.append(skeys[j])
                    rows_d.append(d)
        if not rows_a:
            return out_empty
        return pd.DataFrame({"src_a": rows_a, "src_b": rows_b,
                             "l1_dist": np.array(rows_d, dtype=np.int64)})

    def p_of(df: pd.DataFrame) -> np.ndarray:
        n = df["n"].to_numpy(dtype=np.int64)
        nk = df[key].map(totals).to_numpy(dtype=np.int64)
        return (n * int(scale)) // nk

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        M = np.zeros((1, K), dtype=np.int64)
        M[0, g[key].map(kpos).to_numpy(dtype=np.int64)] = p_of(g)
        return pair_rows(M)

    def block_fn(interior: pd.DataFrame, starts: np.ndarray,
                 ends: np.ndarray) -> pd.DataFrame:
        seg_id = np.zeros(len(interior), dtype=np.int64)
        seg_id[starts[1:]] = 1
        seg_id = np.cumsum(seg_id)
        M = np.zeros((len(starts), K), dtype=np.int64)
        M[seg_id, interior[key].map(kpos).to_numpy(dtype=np.int64)] = \
            p_of(interior)
        return pair_rows(M)

    partials = scan_sorted_groups(counts, "token", group_fn, out_empty,
                                  min_group=1, block_fn=block_fn)
    out = partials.groupby(["src_a", "src_b"]).aggregate(
        Sum("l1_dist", alias_name="l1_dist"))
    return out.select_columns(["src_a", "src_b", "l1_dist"])


def zipf_fit(ds, text_col: str = "text", sep: str = " ",
             round_to: int = 6):
    """Least-squares Zipf fit of the corpus token-frequency
    distribution: regress ``ln(rank)`` on ``ln(count)`` where ``rank``
    is the 1-based position under ``(count DESC, token ASC)`` — one row
    ``(n_tokens, slope, intercept)`` (a healthy natural corpus slopes
    near −1; synthetic / templated / dup-heavy corpora flatten, which
    makes the fit a cheap corpus-shape audit).

    Scale plan: the vocabulary table comes from
    :func:`raqc_ray.ops.unnest.token_counts` (per-block partials, one
    vocab-sized groupby) and is then collapsed to the COUNT-OF-COUNTS
    table ``(c, f)`` — O(sqrt(total)) rows under any Zipf-ish law, tiny
    at every scale — so no global sort and no per-token rank
    materialization ever happens.  That works because within a tie run
    (all tokens sharing count ``c``) the regressand ``ln c`` is
    constant, so every regression moment is invariant to the tie order
    and depends only on the run's rank interval ``(r0, r0+f]``:
    ``sum ln r = lgamma(r0+f+1) - lgamma(r0+1)`` (exact identity; the
    SQL oracle sums per-token ``ln(row_number())`` instead, agreeing to
    float precision — hence ``round_to``).  RAQC analog: none;
    §2 text-analysis surface."""
    import math

    from ray.data.aggregate import Count

    from .unnest import token_counts

    tc = token_counts(ds, text_col, sep=sep)
    cof = (tc.groupby("n").aggregate(Count(alias_name="f"))
           .to_pandas().sort_values("n", ascending=False))
    c = cof["n"].to_numpy(dtype=np.int64)
    f = cof["f"].to_numpy(dtype=np.int64)
    V = int(f.sum())
    out_cols = ["n_tokens", "slope", "intercept"]
    import ray.data as rd

    if V < 2 or len(c) < 2:
        return rd.from_pandas(pd.DataFrame(
            {"n_tokens": pd.Series([V], dtype="int64"),
             "slope": pd.Series([np.nan]),
             "intercept": pd.Series([np.nan])})[out_cols])
    r0 = np.concatenate(([0], np.cumsum(f)[:-1])).astype(np.float64)
    lnc = np.log(c.astype(np.float64))
    # sum of ln(rank) over each run (r0, r0+f] via the lgamma identity
    # (run count is tiny -- a python loop over RUNS, never tokens)
    lg = lambda a: np.array([math.lgamma(x) for x in a])
    s_lnr = lg(r0 + f + 1.0) - lg(r0 + 1.0)
    sy = float(s_lnr.sum())                      # sum ln r
    sx = float((f * lnc).sum())                  # sum ln c
    sxx = float((f * lnc * lnc).sum())           # sum (ln c)^2
    sxy = float((lnc * s_lnr).sum())             # sum ln c * ln r
    den = V * sxx - sx * sx
    slope = (V * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / V
    return rd.from_pandas(pd.DataFrame(
        {"n_tokens": pd.Series([V], dtype="int64"),
         "slope": pd.Series([round(slope, round_to)]),
         "intercept": pd.Series([round(intercept, round_to)])})[out_cols])
