"""Round-4 session-j ops #2: mutual information / G-test, BM25
retrieval, running distinct count, burstiness census — closed-form
planted fixtures, layout invariance, hot-key skew."""

import numpy as np
import pandas as pd
import pytest


def _ds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


# ------------------------------------------------------ mutual information

def test_mutual_information_independent(ray_session):
    from raqc_ray.ops.contingency import mutual_information

    # perfectly independent 2x2 grid -> MI = 0, G = 0
    df = pd.DataFrame({
        "a": ["x"] * 50 + ["y"] * 50,
        "b": (["p", "q"] * 25) * 2,
    })
    out = mutual_information(_ds(df), "a", "b").to_pandas()
    assert out["n"].iloc[0] == 100
    assert out["cells"].iloc[0] == 4
    assert out["mi"].iloc[0] == pytest.approx(0.0, abs=1e-9)
    assert out["g"].iloc[0] == pytest.approx(0.0, abs=1e-9)


def test_mutual_information_deterministic_map(ray_session):
    from raqc_ray.ops.contingency import mutual_information

    # b is a function of a with uniform marginals -> MI = H(a) = ln 2
    df = pd.DataFrame({
        "a": ["x"] * 40 + ["y"] * 40,
        "b": ["p"] * 40 + ["q"] * 40,
    })
    out = mutual_information(_ds(df), "a", "b").to_pandas()
    assert out["mi"].iloc[0] == pytest.approx(np.log(2.0), abs=1e-6)
    # G = 2*N*MI for the exact-function case
    assert out["g"].iloc[0] == pytest.approx(2 * 80 * np.log(2.0),
                                             abs=1e-4)


def test_mutual_information_layout_invariant(ray_session):
    from raqc_ray.ops.contingency import mutual_information

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "a": rng.integers(0, 5, 3000).astype(str),
        "b": rng.integers(0, 7, 3000).astype(str),
    })
    outs = [mutual_information(_ds(df, p), "a", "b").to_pandas()
            for p in (1, 9)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------------------------ bm25

def test_bm25_closed_form(ray_session):
    from raqc_ray.ops.bm25 import bm25_topk

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["cat dog", "cat cat cat", "fish", "cat dog dog dog"],
    })
    out = bm25_topk(_ds(docs, 2), "doc_id", "text", ["cat"],
                    k=3).to_pandas()
    # closed form: N=4, df(cat)=3, total_dl=2+3+1+4=10, avgdl=2.5
    n, dfv, tdl = 4.0, 3.0, 10.0
    idf = np.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5))

    def score(tf, dl):
        return round(idf * (tf * (1.2 + 1.0))
                     / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * n / tdl)),
                     6)

    exp = sorted([(1, score(1, 2)), (2, score(3, 3)), (4, score(1, 4))],
                 key=lambda t: (-t[1], t[0]))
    assert list(zip(out["doc_id"], out["score"])) == exp
    # doc 3 (no query term) never scores
    assert 3 not in set(out["doc_id"])


def test_bm25_tie_break_and_k(ray_session):
    from raqc_ray.ops.bm25 import bm25_topk

    # identical docs -> identical scores -> doc_id ascending order
    docs = pd.DataFrame({
        "doc_id": [5, 3, 9, 1],
        "text": ["cat dog"] * 4,
    })
    out = bm25_topk(_ds(docs, 2), "doc_id", "text", ["cat"],
                    k=3).to_pandas()
    assert out["doc_id"].tolist() == [1, 3, 5]
    assert out["score"].nunique() == 1


def test_bm25_layout_invariant(ray_session):
    from raqc_ray.ops.bm25 import bm25_topk

    rng = np.random.default_rng(7)
    vocab = np.array(["cat", "dog", "fish", "bird", "ant"])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 12)))
             for _ in range(300)]
    docs = pd.DataFrame({"doc_id": np.arange(300), "text": texts})
    outs = [bm25_topk(_ds(docs, p), "doc_id", "text",
                      ["cat", "bird"], k=15).to_pandas()
            for p in (1, 8)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------- running distinct count

def test_running_distinct_closed_form(ray_session):
    from raqc_ray.ops.window import grouped_running_distinct

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2],
        "v": ["a", "b", "a", "c", "x", "x"],
        "t": [10, 20, 30, 40, 10, 20],
        "id": [1, 2, 3, 4, 5, 6],
    })
    out = (grouped_running_distinct(_ds(df, 3), "k", "v", "t", "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["distinct_so_far"].tolist() == [1, 2, 2, 3, 1, 1]


def test_running_distinct_vs_pandas(ray_session):
    from raqc_ray.ops.window import grouped_running_distinct

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "v": rng.integers(0, 6, n).astype(str),
        "t": rng.integers(0, 10 ** 6, n),
        "id": np.arange(n),
    })
    out = (grouped_running_distinct(_ds(df, 8), "k", "v", "t", "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    s = df.sort_values(["k", "t", "id"]).copy()
    s["first"] = ~s.groupby(["k", "v"])["v"].cumcount().astype(bool)
    s["exp"] = s.groupby("k")["first"].cumsum().astype("int64")
    exp = s.sort_values("id")["exp"].to_numpy()
    assert (out["distinct_so_far"].to_numpy() == exp).all()


def test_running_distinct_hot_key(ray_session):
    from raqc_ray.ops.window import grouped_running_distinct

    # one key = 60% of rows spanning every block
    rng = np.random.default_rng(9)
    n = 5000
    k = np.where(rng.random(n) < 0.6, 0, rng.integers(1, 50, n))
    df = pd.DataFrame({
        "k": k,
        "v": rng.integers(0, 8, n).astype(str),
        "t": rng.integers(0, 10 ** 6, n),
        "id": np.arange(n),
    })
    out = (grouped_running_distinct(_ds(df, 10), "k", "v", "t", "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    s = df.sort_values(["k", "t", "id"]).copy()
    s["first"] = ~s.groupby(["k", "v"])["v"].cumcount().astype(bool)
    s["exp"] = s.groupby("k")["first"].cumsum().astype("int64")
    exp = s.sort_values("id")["exp"].to_numpy()
    assert (out["distinct_so_far"].to_numpy() == exp).all()


# --------------------------------------------------------------- burstiness

def test_burstiness_closed_form(ray_session):
    from raqc_ray.ops.runs import burstiness_stats

    # key 1: periodic gaps (10s, 10s) -> sigma=0 -> B = -1
    # key 2: gaps 0s and 20s -> mean=10, sd=10 -> B = 0
    # key 3: single event -> dropped (n_gaps < 2)
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 2, 3],
        "ts": [base, base + pd.Timedelta(seconds=10),
               base + pd.Timedelta(seconds=20),
               base, base, base + pd.Timedelta(seconds=20),
               base],
        "id": [1, 2, 3, 4, 5, 6, 7],
    })
    out = (burstiness_stats(_ds(df, 3), "k", "ts", "id").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2]
    assert out["n_gaps"].tolist() == [2, 2]
    assert out["gap_sum_s"].tolist() == [20, 20]
    assert out["gap_sum2_s"].tolist() == [200, 400]
    assert out["burstiness"].tolist() == [-1.0, 0.0]


def test_burstiness_layout_and_skew(ray_session):
    from raqc_ray.ops.runs import burstiness_stats

    rng = np.random.default_rng(13)
    n = 6000
    k = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 30, n))
    df = pd.DataFrame({
        "k": k,
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10 ** 7, n), unit="s"),
        "id": np.arange(n),
    })
    outs = [(burstiness_stats(_ds(df, p), "k", "ts", "id").to_pandas()
             .sort_values("k").reset_index(drop=True))
            for p in (1, 12)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # cross-check one key against a direct recompute
    s = df[df["k"] == 7].sort_values(["ts", "id"])
    g = (np.diff(s["ts"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64)) // 1_000_000)
    row = outs[0][outs[0]["k"] == 7].iloc[0]
    assert row["n_gaps"] == len(g)
    assert row["gap_sum_s"] == g.sum()
    assert row["gap_sum2_s"] == (g * g).sum()


# ----------------------------------------------- weighted fixed-size sample

def test_weighted_sample_n_size_and_determinism(ray_session):
    from raqc_ray.ops.sample import weighted_sample_n

    df = pd.DataFrame({
        "id": np.arange(1000),
        "w": np.concatenate([np.full(500, 1), np.full(500, 100)]),
    })
    outs = []
    for parts in (1, 8):
        import ray.data as rd
        o = (weighted_sample_n(rd.from_pandas(df).repartition(parts),
                               "id", "w", n=50, salt=3)
             .to_pandas().sort_values("id").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 50
    # weight-proportional: the 100x-weighted half dominates the sample
    assert (outs[0]["id"] >= 500).sum() > 40


def test_weighted_sample_n_drops_nonpositive(ray_session):
    from raqc_ray.ops.sample import weighted_sample_n

    df = pd.DataFrame({"id": [1, 2, 3, 4], "w": [0, -5, 10, 10]})
    out = weighted_sample_n(_ds(df, 2), "id", "w", n=10).to_pandas()
    assert set(out["id"]) == {3, 4}


# ------------------------------------------------------- calibration curve

def test_calibration_closed_form(ray_session):
    from raqc_ray.ops.calibration import calibration_curve

    # cents 0..99 -> max=99, width=100, bucket = c*10//100 = c//10
    # label = 1 iff cents >= 50: buckets 0-4 rate 0, buckets 5-9 rate 1e6
    df = pd.DataFrame({"cents": np.arange(100, dtype=np.int64)})
    df["lab"] = (df["cents"] >= 50).astype(np.int64)
    out = (calibration_curve(_ds(df, 4), "lab", "cents", n_buckets=10)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    assert out["bucket"].tolist() == list(range(10))
    assert out["n"].tolist() == [10] * 10
    assert out["pos_rate_ppm"].tolist() == [0] * 5 + [1_000_000] * 5
    # bucket 0 holds cents 0..9: sum 45, floor-mean 4
    assert out["sum_cents"].iloc[0] == 45
    assert out["mean_cents"].iloc[0] == 4


def test_calibration_all_negative_empty(ray_session):
    """ADVICE r4: zero non-negative rows must yield an EMPTY curve
    with the declared schema, not TypeError(int(None))."""
    from raqc_ray.ops.calibration import calibration_curve

    df = pd.DataFrame({"cents": np.array([-5, -1, -99], dtype=np.int64),
                       "lab": np.array([0, 1, 0], dtype=np.int64)})
    out = calibration_curve(_ds(df, 2), "lab", "cents")
    # empty to_pandas drops columns (engine-wide quirk) — assert on the
    # Dataset schema
    assert out.count() == 0
    assert set(out.schema().names) >= {"bucket", "n", "n_pos",
                                       "sum_cents", "mean_cents",
                                       "pos_rate_ppm"}


def test_burstiness_string_key(ray_session):
    """ADVICE r4: key dtype derives from the Arrow schema — string
    keys must survive the vectorized block path."""
    from raqc_ray.ops.runs import burstiness_stats

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "b"],
        "ts": [base, base + pd.Timedelta(seconds=10),
               base + pd.Timedelta(seconds=20),
               base, base, base + pd.Timedelta(seconds=20)],
        "id": [1, 2, 3, 4, 5, 6],
    })
    out = (burstiness_stats(_ds(df, 3), "k", "ts", "id").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == ["a", "b"]
    assert out["gap_sum_s"].tolist() == [20, 20]
    assert out["gap_sum2_s"].tolist() == [200, 400]


def test_calibration_drops_negative_and_layout(ray_session):
    from raqc_ray.ops.calibration import calibration_curve

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "cents": rng.integers(-50, 1000, 5000),
        "lab": rng.integers(0, 2, 5000),
    })
    outs = [(calibration_curve(_ds(df, p), "lab", "cents").to_pandas()
             .sort_values("bucket").reset_index(drop=True))
            for p in (1, 9)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert outs[0]["n"].sum() == (df["cents"] >= 0).sum()


# ----------------------------------------------------------------- rrf

def test_rrf_closed_form(ray_session):
    import ray.data as rd
    from raqc_ray.ops.bm25 import rrf_fuse

    r1 = rd.from_pandas(pd.DataFrame({"id": [10, 20, 30]}))
    r2 = rd.from_pandas(pd.DataFrame({"id": [20, 40]}))
    out = rrf_fuse([r1, r2], "id", k=4, c=60,
                   scale=10 ** 6).to_pandas()
    exp = {
        10: 10 ** 6 // 61,
        20: 10 ** 6 // 62 + 10 ** 6 // 61,
        30: 10 ** 6 // 63,
        40: 10 ** 6 // 62,
    }
    # 20 appears in both lists -> highest fused score
    assert out["id"].iloc[0] == 20
    got = dict(zip(out["id"], out["rrf"]))
    assert got == exp


def test_rrf_tie_break(ray_session):
    import ray.data as rd
    from raqc_ray.ops.bm25 import rrf_fuse

    # same rank in disjoint lists -> equal score -> id ascending
    r1 = rd.from_pandas(pd.DataFrame({"id": [9]}))
    r2 = rd.from_pandas(pd.DataFrame({"id": [4]}))
    out = rrf_fuse([r1, r2], "id", k=2).to_pandas()
    assert out["id"].tolist() == [4, 9]
