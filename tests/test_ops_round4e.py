"""Unit gates for the round-4e operators: transition matrix, table
diff, global NTILE, z-score, bigram-LM scoring, vocabulary drift and
rebalancing edge cases (the sf0.01 oracle gate covers the happy path;
these pin boundary/skew/empty behavior)."""

import numpy as np
import pandas as pd


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


# ---------------------------------------------------------- transitions

def _transitions_ref(df, key, order, state):
    s = df.sort_values([key, order]).reset_index(drop=True)
    rows = {}
    for _, g in s.groupby(key):
        st = g[state].tolist()
        for a, b in zip(st[:-1], st[1:]):
            rows[(a, b)] = rows.get((a, b), 0) + 1
    return {k: v for k, v in rows.items()}


def test_transition_counts_matches_reference(ray_session):
    from raqc_ray.ops.transitions import transition_counts

    rng = np.random.RandomState(5)
    n = 4000
    df = pd.DataFrame({
        "u": rng.randint(0, 40, n),        # many groups straddle blocks
        "t": rng.permutation(n),           # unique total order
        "s": rng.choice(list("abcd"), n),
    })
    out = transition_counts(_ds(df, 7), "u", "t", "s").to_pandas()
    got = {(a, b): int(c) for a, b, c in
           zip(out["from_state"], out["to_state"], out["n"])}
    assert got == _transitions_ref(df, "u", "t", "s")


def test_transition_counts_hot_key(ray_session):
    """One key = 60% of rows spanning every block (adversarial skew:
    exercises the boundary re-dispatch path)."""
    from raqc_ray.ops.transitions import transition_counts

    rng = np.random.RandomState(9)
    n = 3000
    u = np.where(rng.rand(n) < 0.6, 0, rng.randint(1, 20, n))
    df = pd.DataFrame({"u": u, "t": rng.permutation(n),
                       "s": rng.choice(list("xyz"), n)})
    out = transition_counts(_ds(df, 8), "u", "t", "s").to_pandas()
    got = {(a, b): int(c) for a, b, c in
           zip(out["from_state"], out["to_state"], out["n"])}
    assert got == _transitions_ref(df, "u", "t", "s")
    assert out["n"].sum() == sum(
        max(0, c - 1) for c in pd.Series(u).value_counts())


def test_transition_singletons_emit_nothing(ray_session):
    from raqc_ray.ops.transitions import transition_counts

    df = pd.DataFrame({"u": [1, 2, 3], "t": [1, 2, 3],
                       "s": ["a", "b", "c"]})
    out = transition_counts(_ds(df, 2), "u", "t", "s").to_pandas()
    assert len(out) == 0


# ----------------------------------------------------------------- diff

def test_table_diff_identical_tables_empty(ray_session):
    from raqc_ray.ops.diff import table_diff

    df = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                       "v": np.arange(50, dtype=np.float64)})
    out_ds = table_diff(_ds(df), _ds(df), "k", ["v"])
    assert out_ds.count() == 0
    # schema survives an all-empty result (arrow-typed emit blocks;
    # to_pandas on an empty Dataset is column-less — Ray wart handled
    # by __ray_entry__._typed_pandas)
    assert out_ds.schema().names == ["k", "col", "old_val", "new_val",
                                     "change_type"]


def test_table_diff_all_three_change_types(ray_session):
    from raqc_ray.ops.diff import table_diff

    a = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                      "v": np.array([1.0, 2.0, 3.0])})
    b = pd.DataFrame({"k": np.array([2, 3, 4], dtype=np.int64),
                      "v": np.array([2.0, 30.0, 4.0])})
    out = (table_diff(_ds(a, 2), _ds(b, 2), "k", ["v"]).to_pandas()
           .sort_values(["change_type", "k"]).reset_index(drop=True))
    assert out["change_type"].tolist() == ["added", "changed", "removed"]
    assert out["k"].tolist() == [4, 3, 1]
    ch = out[out["change_type"] == "changed"].iloc[0]
    assert ch["old_val"] == 3.0 and ch["new_val"] == 30.0
    # NaN-on-both-sides counts as equal, never as changed
    a2 = pd.DataFrame({"k": np.array([7], dtype=np.int64),
                       "v": np.array([np.nan])})
    assert len(table_diff(_ds(a2, 1), _ds(a2, 1), "k",
                          ["v"]).to_pandas()) == 0


# --------------------------------------------------------- global ntile

def _ntile_ref(order, k):
    n = len(order)
    base, rem = divmod(n, k)
    out = np.empty(n, dtype=np.int64)
    idx = np.argsort(order, kind="stable")
    pos = 0
    for tile in range(1, k + 1):
        size = base + (1 if tile <= rem else 0)
        out[idx[pos:pos + size]] = tile
        pos += size
    return out


def test_global_ntile_uneven_split(ray_session):
    from raqc_ray.ops.prefix import global_ntile

    rng = np.random.RandomState(3)
    o = rng.permutation(103).astype(np.int64)   # 103 rows, 7 tiles
    df = pd.DataFrame({"o": o})
    out = global_ntile(_ds(df, 5), "o", 7).to_pandas()
    ref = dict(zip(o, _ntile_ref(o, 7)))
    assert all(ref[r.o] == r.tile for r in out.itertuples())


def test_global_ntile_fewer_rows_than_tiles(ray_session):
    from raqc_ray.ops.prefix import global_ntile

    df = pd.DataFrame({"o": np.array([30, 10, 20], dtype=np.int64)})
    out = (global_ntile(_ds(df, 2), "o", 10).to_pandas()
           .sort_values("o"))
    assert out["tile"].tolist() == [1, 2, 3]


# -------------------------------------------------- zscore / lm / drift

def test_grouped_zscore_matches_pandas(ray_session):
    from raqc_ray.ops.moments import grouped_zscore

    rng = np.random.RandomState(11)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 500),
                       "v": rng.randint(0, 1000, 500).astype(np.int64)})
    out = grouped_zscore(_ds(df, 4), "k", "v").to_pandas()
    for k, g in out.groupby("k"):
        ref = (g["v"] - df[df.k == k]["v"].mean()) / \
            df[df.k == k]["v"].std(ddof=1)
        np.testing.assert_allclose(
            np.sort(g["z"].to_numpy()), np.sort(ref.round(6).to_numpy()),
            rtol=0, atol=1e-6)


def test_bigram_lm_short_docs_skipped(ray_session):
    from raqc_ray.ops.corpus import bigram_lm_scores

    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": ["one", "", "a b a c", "a b"]})
    out = bigram_lm_scores(_ds(df, 2), "doc_id", "text").to_pandas()
    # docs 0 and 1 have no bigram -> no row
    assert sorted(out["doc_id"].tolist()) == [2, 3]
    r = out.set_index("doc_id")
    # corpus: c(a b)=2, c(b a)=1, c(a c)=1; c_left(a)=3, c_left(b)=1
    # v(a b)=2e6//3=666666, v(b a)=1e6, v(a c)=1e6//3=333333
    assert int(r.loc[2, "lm_score"]) == (666666 + 1000000 + 333333) // 3
    assert int(r.loc[3, "lm_score"]) == 666666


def test_vocab_drift_identical_sources_zero(ray_session):
    from raqc_ray.ops.corpus import source_vocab_drift

    df = pd.DataFrame({"source": ["s1"] * 10 + ["s2"] * 10,
                       "text": ["w1 w2 w3"] * 20})
    out = source_vocab_drift(_ds(df, 3), "source", "text").to_pandas()
    # identical distributions -> zero distance -> no partial survives,
    # but the final aggregate still yields the pair row iff any partial
    # was emitted; accept either empty or an explicit zero
    assert len(out) == 0 or (out["l1_dist"] == 0).all()


def test_vocab_drift_disjoint_vocabulary(ray_session):
    from raqc_ray.ops.corpus import source_vocab_drift

    df = pd.DataFrame({"source": ["s1"] * 5 + ["s2"] * 5,
                       "text": ["aa bb"] * 5 + ["cc dd"] * 5})
    out = source_vocab_drift(_ds(df, 2), "source", "text").to_pandas()
    # every token mass is disjoint: l1 = 4 * (1e6 // 2) = 2e6
    assert out["l1_dist"].tolist() == [2_000_000]


# ------------------------------------------------- journey / wmedian

def test_journey_prefix_matches_reference(ray_session):
    from raqc_ray.ops.transitions import journey_prefix

    rng = np.random.RandomState(21)
    n = 2500
    u = np.where(rng.rand(n) < 0.5, 3, rng.randint(0, 30, n))  # hot key
    df = pd.DataFrame({"u": u.astype(np.int64),
                       "t": rng.permutation(n),
                       "s": rng.choice(list("pqrs"), n)})
    out = journey_prefix(_ds(df, 6), "u", "t", "s", k=4).to_pandas()
    ref = {}
    for uk, g in df.sort_values("t").groupby("u"):
        ref[uk] = (">".join(g["s"].head(4)), len(g))
    assert len(out) == len(ref)
    for r in out.itertuples():
        assert ref[r.u] == (r.journey, r.n_events)


def test_weighted_median_matches_expansion(ray_session):
    from raqc_ray.ops.quantile_exact import grouped_weighted_median

    rng = np.random.RandomState(13)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 400),
                       "v": rng.randint(0, 50, 400).astype(np.int64),
                       "w": rng.randint(0, 5, 400).astype(np.int64)})
    out = (grouped_weighted_median(_ds(df, 4), "k", "v", "w")
           .to_pandas().set_index("k"))
    for k, g in df.groupby("k"):
        expanded = np.sort(np.repeat(g["v"].to_numpy(),
                                     g["w"].to_numpy()))
        total = int(g["w"].sum())
        # lower weighted median: first expanded element at cum*2 >= W
        lower = expanded[(total - 1) // 2] if total else None
        assert int(out.loc[k, "w_total"]) == total
        if total:
            assert int(out.loc[k, "wmedian"]) == int(lower)
