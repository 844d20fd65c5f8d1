"""Unit gates for ops/graph (triangle counting, integer PageRank) and
ops/unnest.posting_lists — each checked against a brute-force
driver-side reference on randomized graphs plus closed-form cases."""

import numpy as np
import pandas as pd
import pytest


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


def _brute_triangles(pairs: pd.DataFrame) -> int:
    adj = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    n = 0
    for a, b in zip(pairs["a"], pairs["b"]):
        n += len(adj[int(a)] & adj[int(b)])
    # each triangle is counted once per edge
    return n // 3


def _brute_pagerank(pairs: pd.DataFrame, iters=3, scale=10 ** 9):
    adj = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    nodes = sorted(adj)
    n = len(nodes)
    base = (15 * scale) // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for u in nodes:
            c = (85 * r[u]) // (100 * len(adj[u]))
            for v in adj[u]:
                nxt[v] += c
        r = nxt
    return r


# ---------------------------------------------------------- triangles


def test_triangle_known(ray_session):
    from raqc_ray.ops.graph import triangle_count

    # K4 (4 triangles) plus a pendant edge and an isolated edge
    pairs = pd.DataFrame({
        "a": [1, 1, 1, 2, 2, 3, 3, 10],
        "b": [2, 3, 4, 3, 4, 4, 5, 11],
    })
    out = triangle_count(_ds(pairs, 3), "a", "b").to_pandas()
    assert out["n_triangles"].tolist() == [4]
    # every triangle contributes exactly one wedge candidate; wedges
    # are bounded by sum C(outdeg, 2) of the degree orientation
    assert int(out["n_wedges"].iloc[0]) >= 4


def test_triangle_free_and_empty(ray_session):
    from raqc_ray.ops.graph import triangle_count

    chain = pd.DataFrame({"a": [1, 2, 3, 4], "b": [2, 3, 4, 5]})
    out = triangle_count(_ds(chain, 2), "a", "b").to_pandas()
    assert out["n_triangles"].tolist() == [0]

    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64")})
    out = triangle_count(_ds(empty, 1), "a", "b").to_pandas()
    assert out["n_triangles"].tolist() == [0]
    assert out["n_wedges"].tolist() == [0]


def test_triangle_random_vs_brute(ray_session):
    from raqc_ray.ops.graph import triangle_count

    rng = np.random.default_rng(7)
    a = rng.integers(0, 60, 600)
    b = rng.integers(0, 60, 600)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    pairs = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
    want = _brute_triangles(pairs)
    assert want > 0
    out = triangle_count(_ds(pairs, 5), "a", "b").to_pandas()
    assert out["n_triangles"].tolist() == [want]


def test_triangle_layout_invariant(ray_session):
    from raqc_ray.ops.graph import triangle_count

    rng = np.random.default_rng(11)
    a = rng.integers(0, 40, 300)
    b = rng.integers(0, 40, 300)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    pairs = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
    outs = [triangle_count(_ds(pairs, k), "a", "b").to_pandas()
            for k in (1, 7)]
    assert outs[0]["n_triangles"].tolist() == outs[1]["n_triangles"].tolist()
    assert outs[0]["n_wedges"].tolist() == outs[1]["n_wedges"].tolist()


# ---------------------------------------------------------- pagerank


def test_pagerank_vs_brute_both_regimes(ray_session):
    from raqc_ray.ops.graph import pagerank

    rng = np.random.default_rng(3)
    a = rng.integers(0, 30, 200)
    b = rng.integers(0, 30, 200)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    pairs = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
    want = _brute_pagerank(pairs)
    for limit in (2_000_000, 0):  # broadcast regime / join regime
        out = (pagerank(_ds(pairs, 4), "a", "b", iterations=3,
                        broadcast_limit=limit)
               .to_pandas().sort_values("id").reset_index(drop=True))
        got = dict(zip(out["id"].astype(int), out["pr"].astype(int)))
        assert got == want


def test_pagerank_star_mass(ray_session):
    from raqc_ray.ops.graph import pagerank

    # star: hub 0 with 8 leaves — hub rank must dominate, total mass
    # conserved up to the floor losses (every term only shrinks)
    pairs = pd.DataFrame({"a": [0] * 8, "b": list(range(1, 9))})
    out = pagerank(_ds(pairs, 2), "a", "b", iterations=3).to_pandas()
    r = dict(zip(out["id"].astype(int), out["pr"].astype(int)))
    assert all(r[0] > r[v] for v in range(1, 9))
    assert sum(r.values()) <= 10 ** 9
    assert sum(r.values()) >= 10 ** 9 - 9 * 3 * 2  # floor loss bound


def test_pagerank_empty(ray_session):
    from raqc_ray.ops.graph import pagerank

    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64")})
    out = pagerank(_ds(empty, 1), "a", "b").to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------- postings


def test_posting_lists_known(ray_session):
    from raqc_ray.ops.unnest import posting_lists

    docs = pd.DataFrame({
        "doc_id": [3, 1, 2, 4],
        "text": ["cat dog", "dog fish cat dog", "fish dog", "emu"],
    })
    out = (posting_lists(_ds(docs, 2), "doc_id", "text", min_df=2)
           .to_pandas().set_index("token").sort_index())
    assert out.loc["dog", "postings"] == "1,2,3"
    assert int(out.loc["dog", "df"]) == 3
    assert out.loc["cat", "postings"] == "1,3"
    assert out.loc["fish", "postings"] == "1,2"
    assert "emu" not in out.index  # df=1 < min_df


def test_posting_lists_max_df_and_dupes(ray_session):
    from raqc_ray.ops.unnest import posting_lists

    docs = pd.DataFrame({
        "doc_id": list(range(10)),
        "text": ["the the cat" if i < 9 else "the" for i in range(10)],
    })
    out = (posting_lists(_ds(docs, 4), "doc_id", "text",
                         min_df=1, max_df=9)
           .to_pandas().set_index("token"))
    # "the" appears in all 10 docs -> dropped by max_df; within-doc
    # repeats collapse ("the the" counts once per doc)
    assert "the" not in out.index
    assert out.loc["cat", "postings"] == ",".join(map(str, range(9)))
