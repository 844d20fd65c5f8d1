"""Exact prefix-filter set-similarity join (ops/setjoin).

Gates:
- hash-order and df-order produce byte-identical pair sets (exactness is
  order-independent; only pruning power differs);
- both match a brute-force all-pairs exact Jaccard recompute (the
  prefix-filter lemma finds EVERY qualifying pair — no recall caveat);
- the hot-bucket guard raises instead of emitting quadratic pairs;
- layout invariance (repartitioned input, same result).
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raqc_ray.ops.dedup import _shingle_hashes, _token_hash
from raqc_ray.ops.setjoin import _prefix_len, prefix_jaccard_join

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lamda mu nu xi omicron pi rho sigma tau upsilon").split()


def _corpus(n=120, seed=11):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        toks = rng.choice(_WORDS, size=rng.integers(5, 30)).tolist()
        texts.append(" ".join(toks))
    # plant near-duplicate pairs: copy with a 1-2 token edit
    for i in range(0, n, 10):
        toks = texts[i].split()
        toks[0] = "planted"
        texts[(i + 1) % n] = " ".join(toks)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _exact_bruteforce(docs: pd.DataFrame, k: int, t: float) -> pd.DataFrame:
    sets = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split()
        th = np.fromiter((_token_hash(x) for x in toks), dtype=np.uint64,
                         count=len(toks))
        sets[int(doc_id)] = _shingle_hashes(th, k)
    ids = sorted(sets)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            j = inter / union if union else 0.0
            if j >= t:
                rows.append((a, b, round(float(j), 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
            [["doc_a", "doc_b", "jaccard"]])


@pytest.fixture(scope="module")
def corpus(ray_session):
    return _corpus()


def test_prefix_len():
    # |x| - ceil(t|x|) + 1, floor at 1
    assert _prefix_len(10, 0.5) == 6
    assert _prefix_len(1, 0.5) == 1
    assert _prefix_len(4, 0.9) == 1
    assert _prefix_len(7, 0.3) == 5


def test_matches_bruteforce_and_orders_agree(corpus):
    ds = rd.from_pandas(corpus).repartition(7)
    want = _canon(_exact_bruteforce(corpus, 3, 0.5))
    got_hash = _canon(prefix_jaccard_join(ds, threshold=0.5,
                                          order="hash").to_pandas())
    got_df = _canon(prefix_jaccard_join(ds, threshold=0.5,
                                        order="df").to_pandas())
    assert len(want) > 0  # planted dups actually qualify
    pd.testing.assert_frame_equal(got_hash, want, check_dtype=False)
    pd.testing.assert_frame_equal(got_df, want, check_dtype=False)


def test_low_threshold_complete(corpus):
    # lower threshold → wider prefixes, more candidates; still exact
    ds = rd.from_pandas(corpus)
    want = _canon(_exact_bruteforce(corpus, 3, 0.25))
    got = _canon(prefix_jaccard_join(ds, threshold=0.25,
                                     order="hash").to_pandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_layout_invariance(corpus):
    ds1 = rd.from_pandas(corpus).repartition(2)
    ds2 = rd.from_pandas(corpus.iloc[::-1].reset_index(drop=True)
                         ).repartition(13)
    a = _canon(prefix_jaccard_join(ds1, threshold=0.5).to_pandas())
    b = _canon(prefix_jaccard_join(ds2, threshold=0.5).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_hot_bucket_guard(corpus):
    ds = rd.from_pandas(corpus)
    with pytest.raises(Exception, match="max_bucket"):
        prefix_jaccard_join(ds, threshold=0.5, order="hash",
                            max_bucket=2).to_pandas()


def _stopword_corpus(n=80, seed=5):
    """Adversarially skewed vocabulary: every doc opens with the same
    12-token boilerplate (its 3-gram shingles hit df = n) followed by a
    10-16-token unique tail — the stopword-heavy regime where
    hash-order prefixes produce an n-sized bucket but df-order (PPJoin)
    prefixes stay inside the rare tail shingles.  One near-dup pair is
    planted (doc 1 = doc 0 with a one-token tail edit)."""
    rng = np.random.default_rng(seed)
    boiler = ("terms of service apply to all content on this page "
              "please read")
    texts = []
    for i in range(n):
        tail = " ".join(f"tail{i}x{j}"
                        for j in range(rng.integers(10, 17)))
        texts.append(f"{boiler} {tail}")
    toks = texts[0].split()
    toks[-1] = "edited"
    texts[1] = " ".join(toks)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_df_default_survives_stopword_skew(ray_session):
    """VERDICT r4 #4: the df (PPJoin) DEFAULT must pass a skewed
    stopword-heavy corpus without tripping max_bucket, where the
    hash order trips it at the same setting."""
    docs = _stopword_corpus()
    ds = rd.from_pandas(docs).repartition(5)
    # df order (the default) — rare tail shingles fill the prefixes
    got = _canon(prefix_jaccard_join(ds, threshold=0.6,
                                     max_bucket=20).to_pandas())
    want = _canon(_exact_bruteforce(docs, 3, 0.6))
    assert len(want) > 0  # the planted pair qualifies
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # hash order at the same cap: boilerplate shingles land in
    # prefixes and the bucket guard fires
    with pytest.raises(Exception, match="max_bucket"):
        prefix_jaccard_join(ds, threshold=0.6, order="hash",
                            max_bucket=20).to_pandas()


def test_empty_and_singleton(ray_session):
    docs = pd.DataFrame({"doc_id": pd.Series([7], dtype="int64"),
                         "text": ["only one document here"]})
    out = prefix_jaccard_join(rd.from_pandas(docs), threshold=0.5)
    # empty result keeps the declared schema on the Dataset (to_pandas
    # of an empty Dataset drops columns — the engine-wide _typed_pandas
    # quirk); assert at the Dataset level
    assert set(out.schema().names) >= {"doc_a", "doc_b", "jaccard"}
    assert out.count() == 0
