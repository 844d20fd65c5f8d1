"""Unit tests for the training-data ops (dedup / ANN / text / multimodal)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    # long, distinct docs: planted near-dups must sit at high Jaccard
    # (>=0.9) where 16x4-band LSH detection probability is ~1.0 — a
    # one-word edit in a 10-token doc (~0.45) is a coin flip by design
    rng = np.random.default_rng(13)
    vocab = [f"w{j}" for j in range(500)]
    texts = [
        " ".join(rng.choice(vocab, size=40, replace=True)) for _ in range(200)
    ]
    # planted near-dups: one-token edits of long docs (Jaccard ~0.95)
    texts[190] = texts[0].replace(texts[0].split()[5], "EDITED", 1)
    texts[191] = texts[1] + " extra"
    # planted exact dups
    texts[195] = texts[5]
    texts[196] = texts[5]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    return rd.from_pandas(df), texts


def test_exact_dedup(docs_ds):
    from raqc_ray.ops.dedup import exact_dedup

    ds, texts = docs_ds
    out = exact_dedup(ds).to_pandas()
    assert len(out) == 198  # 200 rows, one text appears 3x → 198 distinct
    trip = out[out["n"] == 3]
    assert len(trip) == 1 and int(trip["doc_id"].iloc[0]) == 5


def test_minhash_lsh_finds_planted_pairs(docs_ds):
    from raqc_ray.ops.dedup import minhash_lsh_pairs

    ds, _ = docs_ds
    pairs = minhash_lsh_pairs(ds, threshold=0.4).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 190) in got
    assert (1, 191) in got
    assert (5, 195) in got and (5, 196) in got and (195, 196) in got
    # estimated jaccard of exact dups is 1.0
    exact = pairs[(pairs["doc_a"] == 5) & (pairs["doc_b"] == 195)]
    assert float(exact["est_jaccard"].iloc[0]) == 1.0


def test_simhash_near_for_similar_text():
    from raqc_ray.ops.dedup import simhash64
    from raqc_ray.codecs import hamming64

    s = pd.Series(["the quick brown fox jumps over the lazy dog " * 5,
                   "the quick brown fox jumps over the lazy cat " * 5,
                   "completely different content about snow rasters bands"])
    h = simhash64(s)
    assert hamming64(int(h[0]), int(h[1])) <= 12
    assert hamming64(int(h[0]), int(h[2])) > 12


def test_brute_topk_exact(ray_session):
    import ray.data as rd
    from raqc_ray.ops.ann import brute_topk

    rng = np.random.default_rng(4)
    emb = rng.normal(size=(300, 16))
    df = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64),
                       "embedding": list(emb.astype(np.float32))})
    ds = rd.from_pandas(df)
    queries = emb[:3]
    out = brute_topk(ds, queries, k=4).to_pandas()
    # oracle: numpy exact
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sim = q @ n.T
    for qi in range(3):
        exp = np.argsort(-sim[qi], kind="stable")[:4]
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].to_numpy()
        assert got[0] == qi  # self is top-1
        assert set(got) == set(exp.tolist())


def test_ivf_topk_recall(ray_session):
    import ray.data as rd
    from raqc_ray.ops.ann import brute_topk, ivf_topk

    rng = np.random.default_rng(9)
    # clustered data so IVF cells are meaningful
    centers = rng.normal(size=(8, 16)) * 4
    emb = np.concatenate([c + rng.normal(size=(50, 16)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(emb), dtype=np.int64),
                       "embedding": list(emb.astype(np.float32))})
    ds = rd.from_pandas(df)
    queries = emb[:5]
    exact = brute_topk(ds, queries, k=5).to_pandas()
    approx = ivf_topk(ds, queries, k=5, nlist=8, nprobe=3).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8  # nprobe=3/8 on tight clusters


def test_quality_and_tokens(ray_session):
    from raqc_ray.ops.text import QualityScorer, token_count

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["Hello, world! Two tokens?",
                                                  None]})
    tc = token_count(df)
    assert tc["n_tokens"].tolist() == [4, 0]
    qs = QualityScorer()(df)
    assert qs["n_chars"].tolist()[0] == 25
    assert 0 < qs["punct_ratio"].iloc[0] < 0.2


def test_langid():
    from raqc_ray.ops.text import LangId

    li = LangId()
    assert li.predict_one("the cat and the dog of a house is that it") == "en"
    assert li.predict_one("der hund und die katze ist ein tier nicht") == "de"
    # out-of-profile character soup → no confident match
    assert li.predict_one("zzq xq jj kk 88 9 77") == "other"
    assert li.predict_one("") == "other"


def test_multimodal_image_features(ray_session, t1_fixture):
    import os
    import ray.data as rd
    from raqc_ray.ops.multimodal import extract_image_features

    root = t1_fixture["root"]
    f = os.path.join(root, "e1", "part-00001.parquet")  # clean partition
    ds = rd.read_parquet(f)
    out = extract_image_features(ds, batch_size=64, concurrency=2).to_pandas()
    assert len(out) == t1_fixture["rows_per_partition"]
    assert out["ok"].all()
    assert all(len(f) == 64 for f in out["feature"])


def test_multimodal_fake_decoder():
    import pyarrow as pa
    from raqc_ray.ops.multimodal import DeterministicFakeDecoder

    dec = DeterministicFakeDecoder("audio", id_col="item_id")
    batch = pa.table({"item_id": ["a", "b"], "bytes": [b"payload1", None]})
    out = dec(batch).to_pandas()
    assert out["ok"].tolist() == [True, False]
    # deterministic: same payload → same feature
    out2 = dec(batch).to_pandas()
    assert np.array_equal(np.array(out["feature"][0]), np.array(out2["feature"][0]))


def test_ngram_jaccard_exact(docs_ds):
    from raqc_ray.ops.dedup import ngram_jaccard_pairs

    ds, _ = docs_ds
    pairs = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    got = {(int(a), int(b)): j for a, b, j in
           zip(pairs["doc_a"], pairs["doc_b"], pairs["jaccard"])}
    assert got[(5, 195)] == 1.0  # exact dup → jaccard exactly 1
    assert (0, 190) in got and got[(0, 190)] > 0.8  # one-token edit
    # unrelated docs never pass the exact verify
    assert all(j >= 0.5 for j in got.values())


def test_groupscan_matches_per_group(ray_session):
    import pandas as pd
    import ray.data as rd
    from raqc_ray.ops.groupscan import scan_sorted_groups

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({"k": rng.integers(0, 800, n), "v": rng.integers(0, 100, n)})

    def group_fn(g):
        return pd.DataFrame({"k": [int(g["k"].iloc[0])],
                             "total": [int(g["v"].sum())],
                             "n": [len(g)]})

    empty = pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "total": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64")})
    res_ds = scan_sorted_groups(rd.from_pandas(df).repartition(8),
                                "k", group_fn, empty)
    res = res_ds.to_pandas()
    # oracle: plain pandas groupby (groups of size 1 excluded by contract)
    exp = df.groupby("k").agg(total=("v", "sum"), n=("v", "size")).reset_index()
    exp = exp[exp["n"] >= 2]
    res = res.sort_values("k").reset_index(drop=True)[["k", "total", "n"]]
    exp = exp.sort_values("k").reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(res.astype("int64"), exp)


def test_groupscan_skewed_hot_key_distributed_boundary(ray_session):
    """Adversarial skew: one key owns 20% of rows and spans many blocks.
    With driver_boundary_limit=0 the boundary re-scan MUST run
    distributed (groupby.map_groups over boundary rows only) and still
    match the plain-pandas oracle — no driver-side group
    materialization."""
    import pandas as pd
    import ray.data as rd
    from raqc_ray.ops.groupscan import scan_sorted_groups

    rng = np.random.default_rng(11)
    n = 20000
    k = rng.integers(0, 500, n)
    k[: n // 5] = 42  # hot key = 20% of all rows
    df = pd.DataFrame({"k": k, "v": rng.integers(0, 100, n)})

    def group_fn(g):
        return pd.DataFrame({"k": [int(g["k"].iloc[0])],
                             "total": [int(g["v"].sum())],
                             "n": [len(g)]})

    empty = pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "total": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64")})
    res = scan_sorted_groups(
        rd.from_pandas(df).repartition(16), "k", group_fn, empty,
        driver_boundary_limit=0,
    ).to_pandas()
    exp = df.groupby("k").agg(total=("v", "sum"), n=("v", "size")).reset_index()
    exp = exp[exp["n"] >= 2]
    res = res.sort_values("k").reset_index(drop=True)[["k", "total", "n"]]
    exp = exp.sort_values("k").reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(res.astype("int64"), exp)


def test_groupscan_block_fn_equivalence(ray_session):
    """block_fn vectorized path must be emission-equivalent to looping
    group_fn over the segments."""
    import pandas as pd
    import ray.data as rd
    from raqc_ray.ops.groupscan import scan_sorted_groups

    rng = np.random.default_rng(5)
    n = 8000
    df = pd.DataFrame({"k": rng.integers(0, 600, n), "v": rng.integers(0, 50, n)})

    def group_fn(g):
        return pd.DataFrame({"k": [int(g["k"].iloc[0])],
                             "mx": [int(g["v"].max())]})

    def block_fn(interior, starts, ends):
        v = interior["v"].to_numpy()
        kk = interior["k"].to_numpy()
        return pd.DataFrame({"k": kk[starts].astype("int64"),
                             "mx": np.maximum.reduceat(v, starts).astype("int64")})

    empty = pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "mx": pd.Series(dtype="int64")})
    # min_group=1 so the qualifying segments are contiguous (reduceat's
    # [starts[i], starts[i+1]) contract holds exactly)
    src = rd.from_pandas(df).repartition(8)
    a = scan_sorted_groups(src, "k", group_fn, empty,
                           min_group=1).to_pandas()
    b = scan_sorted_groups(src, "k", group_fn, empty, min_group=1,
                           block_fn=block_fn).to_pandas()
    a = a.sort_values(["k"]).reset_index(drop=True)
    b = b.sort_values(["k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_image_features_jpeg_payload():
    """Multimodal decode is real for jpeg now (vendored baseline codec)."""
    import numpy as np
    import pyarrow as pa

    from raqc_ray.codecs import encode_image, synth_image
    from raqc_ray.ops.multimodal import ImageFeatureExtractor

    rng = np.random.default_rng(3)
    img = synth_image(rng, 64, 48)
    batch = pa.table(
        {"image_id": ["a", "b"],
         "bytes": [encode_image(img, "jpeg"), b"truncated-garbage"],
         "fmt": ["jpeg", "jpeg"]}
    )
    out = ImageFeatureExtractor()(batch).to_pandas()
    assert bool(out.loc[0, "ok"]) is True
    feat = np.asarray(out.loc[0, "feature"])
    assert feat.shape == (64,)
    # grid means of a near-lossless roundtrip track the source luma
    luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2])
    assert abs(feat.mean() - luma.mean()) < 2.0
    assert bool(out.loc[1, "ok"]) is False


def test_image_resize_area_mean(ray_session):
    """Area-mean downscale of a block-constant image must hit the block
    means exactly; plumbing through the actor-pool stage preserves ids
    and marks undecodable rows instead of dying."""
    import ray.data as rd

    from raqc_ray.codecs import decode_image, encode_ppm
    from raqc_ray.ops.multimodal import resize_images

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4, :4] = 10; img[:4, 4:] = 30; img[4:, :4] = 50; img[4:, 4:] = 70
    tbl = pd.DataFrame(
        {"image_id": ["a", "bad"],
         "bytes": [encode_ppm(img), b"not an image"],
         "fmt": ["ppm", "ppm"]})
    out = resize_images(rd.from_pandas(tbl), 2, 2,
                        concurrency=1).to_pandas().set_index("image_id")
    assert bool(out.loc["a", "ok"]) and not bool(out.loc["bad", "ok"])
    small = decode_image(bytes(out.loc["a", "bytes"]), "ppm")
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 10 and small[0, 1, 0] == 30
    assert small[1, 0, 0] == 50 and small[1, 1, 0] == 70
    # upscale path: 2x2 -> 4x4 nearest repeats each pixel
    up = resize_images(rd.from_pandas(tbl.iloc[:1]), 16, 16,
                       concurrency=1).to_pandas()
    big = decode_image(bytes(up["bytes"].iloc[0]), "ppm")
    assert big.shape == (16, 16, 3)


def test_video_frame_sampler(ray_session):
    """1->k row expansion: uniform distinct frame indices, deterministic
    features, null/zero-frame rows marked not exploded."""
    import ray.data as rd

    from raqc_ray.ops.multimodal import sample_video_frames

    import pyarrow as pa
    import ray

    tbl = pd.DataFrame(
        {"item_id": ["v1", "v2", "v3", "v4"],
         "bytes": [b"payload-one", b"p2", None, b"p4"],
         "n_frames": [100, 2, 50, 0]})

    def collect(ds):
        # arrow-side collect: pandas TensorArray casting rejects the
        # mixed None/list<float32> feature column by design
        return pa.concat_tables(
            ray.get(ds.to_arrow_refs())).to_pandas(ignore_metadata=True)

    out = collect(sample_video_frames(rd.from_pandas(tbl), k=4,
                                      concurrency=1))
    g = out.groupby("item_id")
    assert len(g.get_group("v1")) == 4          # k samples
    assert g.get_group("v1")["frame_idx"].tolist() == [0, 25, 50, 75]
    assert len(g.get_group("v2")) == 2          # min(k, n_frames)
    assert not g.get_group("v3")["ok"].any()    # null payload
    assert not g.get_group("v4")["ok"].any()    # zero frames
    # determinism: same payload + frame -> same feature
    out2 = collect(sample_video_frames(rd.from_pandas(tbl), k=4,
                                       concurrency=1))
    f1 = np.stack(g.get_group("v1")["feature"].to_list())
    f2 = np.stack(out2[out2["item_id"] == "v1"]["feature"].to_list())
    assert np.array_equal(f1, f2)
