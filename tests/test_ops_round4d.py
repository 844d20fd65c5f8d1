"""Unit gates for the round-4d operators: corpus hygiene
(decontamination, repetition, n-gram vocabulary), deterministic
upsampling, and the global ordered prefix sum / token sharder."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


# ---------------------------------------------------------------- corpus

def test_word_ngrams_filtering_and_adjacency():
    from raqc_ray.ops.corpus import word_ngrams

    # double space: empty token dropped, c and d become adjacent
    col = pa.array(["a b c  d", "x y", ""])
    par, sh = word_ngrams(col, 2)
    assert sh.tolist() == ["a b", "b c", "c d", "x y"]
    assert par.tolist() == [0, 0, 0, 1]


def test_word_ngrams_short_docs_emit_nothing():
    from raqc_ray.ops.corpus import word_ngrams

    par, sh = word_ngrams(pa.array(["one", "two"]), 3)
    assert len(par) == 0 and len(sh) == 0


def test_repetition_ratio_planted(ray_session):
    from raqc_ray.ops.corpus import repetition_ratio

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a b a b",      # 3-grams: aba bab aba bab → dup 0.5
                 "p q r s",          # all distinct → dup 0
                 "xy"],              # < 3 tokens → no row
    })
    out = (repetition_ratio(_ds(df), "doc_id", "text", n=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_ngrams"].tolist() == [4, 2]
    assert out["n_distinct"].tolist() == [2, 2]
    assert out["dup_frac"].tolist() == [0.5, 0.0]


def test_contamination_hits_planted(ray_session):
    from raqc_ray.ops.corpus import contamination_hits

    bench = pd.DataFrame({
        "doc_id": [100],
        "text": ["the quick brown fox jumps over the lazy dog"],
    })
    train = pd.DataFrame({
        "doc_id": [1, 2, 3],
        # doc 1 shares two distinct 5-grams with the benchmark,
        # doc 2 shares one (twice — counted once), doc 3 none
        "text": ["x the quick brown fox jumps over y",
                 "brown fox jumps over the z brown fox jumps over the",
                 "entirely different words with no overlap at all"],
    })
    out = (contamination_hits(_ds(train), _ds(bench, blocks=1),
                              "doc_id", "text", n=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_shared"].tolist() == [2, 1]


def test_distinct_ngrams_by_source_planted(ray_session):
    from raqc_ray.ops.corpus import distinct_ngrams_by_source

    df = pd.DataFrame({
        "source": ["s1", "s1", "s2"],
        "text": ["a b c a b c",     # 2-grams: ab bc ca ab bc (5, 3 distinct)
                 "a b",             # ab (dup of s1's)
                 "a b"],
    })
    out = (distinct_ngrams_by_source(_ds(df), "source", "text", n=2)
           .to_pandas().sort_values("source").reset_index(drop=True))
    assert out["source"].tolist() == ["s1", "s2"]
    assert out["n_ngrams"].tolist() == [6, 1]
    assert out["n_distinct"].tolist() == [3, 1]


# --------------------------------------------------------------- upsample

def test_upsample_by_key_fanout_and_copy_idx(ray_session):
    from raqc_ray.ops.sample import upsample_by_key

    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "lang": ["fr", "en", "fr", "de"]})
    out = (upsample_by_key(_ds(df), "lang", {"fr": 3, "de": 2})
           .to_pandas().sort_values(["id", "copy_idx"])
           .reset_index(drop=True))
    counts = out.groupby("id")["copy_idx"].agg(["count", "max"])
    assert counts.loc[1].tolist() == [3, 2]
    assert counts.loc[2].tolist() == [1, 0]
    assert counts.loc[3].tolist() == [3, 2]
    assert counts.loc[4].tolist() == [2, 1]
    # copy_idx is a dense 0..k-1 per source row
    assert out[out["id"] == 1]["copy_idx"].tolist() == [0, 1, 2]


# ----------------------------------------------------------- prefix sum

def test_ordered_prefix_sum_matches_numpy(ray_session):
    from raqc_ray.ops.prefix import ordered_prefix_sum

    rng = np.random.default_rng(7)
    n = 5000
    order = rng.permutation(n).astype(np.int64)      # unique, shuffled
    vals = rng.integers(0, 100, n).astype(np.int64)
    df = pd.DataFrame({"o": order, "v": vals})
    out = (ordered_prefix_sum(_ds(df, blocks=11), "o", "v", "p")
           .to_pandas().sort_values("o").reset_index(drop=True))
    sorted_v = df.sort_values("o")["v"].to_numpy()
    expect = np.cumsum(sorted_v) - sorted_v
    assert len(out) == n
    np.testing.assert_array_equal(out["p"].to_numpy(), expect)


def test_ordered_prefix_sum_layout_invariant(ray_session):
    from raqc_ray.ops.prefix import ordered_prefix_sum

    rng = np.random.default_rng(11)
    # clustered order values: many empty buckets, hot buckets spanning
    # blocks (exercises both the boundary path and sparse offsets)
    order = np.concatenate([rng.choice(10**9, 50, replace=False),
                            np.arange(300, dtype=np.int64)])
    vals = rng.integers(-50, 50, len(order)).astype(np.int64)
    df = pd.DataFrame({"o": order, "v": vals})
    outs = []
    for blocks in (1, 2, 13):
        out = (ordered_prefix_sum(_ds(df, blocks=blocks), "o", "v", "p")
               .to_pandas().sort_values("o").reset_index(drop=True))
        outs.append(out)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    sorted_v = df.sort_values("o")["v"].to_numpy()
    np.testing.assert_array_equal(
        outs[0]["p"].to_numpy(), np.cumsum(sorted_v) - sorted_v)


def test_ordered_prefix_sum_empty(ray_session):
    from raqc_ray.ops.prefix import ordered_prefix_sum

    df = pd.DataFrame({"o": pd.Series(dtype="int64"),
                       "v": pd.Series(dtype="int64")})
    out = ordered_prefix_sum(_ds(df, blocks=1), "o", "v", "p")
    assert out.count() == 0
    # Dataset.to_pandas drops columns for zero-row datasets (the
    # _typed_pandas quirk) — assert on the declared schema instead
    assert "p" in out.schema().names


def test_token_shards_planted(ray_session):
    from raqc_ray.ops.prefix import token_shards

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c", "d e", "f g h i", "j"],   # tokens 3,2,4,1
    })
    out = (token_shards(_ds(df), "doc_id", "text", budget=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # exclusive prefixes: 0,3,5,9 → shards 0,0,1,2
    assert out["n_tokens"].tolist() == [3, 2, 4, 1]
    assert out["shard_id"].tolist() == [0, 0, 1, 2]


def test_adjacent_bigram_scores_planted(ray_session):
    from raqc_ray.ops.corpus import adjacent_bigram_scores

    # corpus: "a b" ×3, "b c" ×2, "c a" ×1 → N=6
    df = pd.DataFrame({"text": ["a b c a b", "a b c"]})
    # bigrams doc1: ab bc ca ab ; doc2: ab bc → ab:3 bc:2 ca:1
    out = (adjacent_bigram_scores(_ds(df), "text", min_count=2,
                                  scale=1000)
           .to_pandas().sort_values(["w1", "w2"])
           .reset_index(drop=True))
    assert out[["w1", "w2"]].values.tolist() == [["a", "b"], ["b", "c"]]
    assert out["c_xy"].tolist() == [3, 2]
    # c_x(a)=3, c_y(b)=3 → 3*6*1000 // 9 = 2000
    # c_x(b)=2, c_y(c)=2 → 2*6*1000 // 4 = 3000
    assert out["score"].tolist() == [2000, 3000]
