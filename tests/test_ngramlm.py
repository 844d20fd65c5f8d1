"""Corpus bigram-LM NLL census (ops/ngramlm).

Gates: brute-force reference equivalence (counts + Laplace + mean NLL
recomputed in plain Python), layout invariance (the canonical
position-order summation), short-doc exclusion, exact distinct scalar.
"""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from raqc_ray.ops.ngramlm import bigram_nll_census, exact_distinct_scalar


def _reference(docs: pd.DataFrame) -> pd.DataFrame:
    toks = {int(d): t.split() for d, t in zip(docs["doc_id"], docs["text"])}
    cuw: dict[tuple, int] = {}
    cu: dict[str, int] = {}
    vocab = set()
    for t in toks.values():
        vocab.update(t)
        for a, b in zip(t[:-1], t[1:]):
            cuw[(a, b)] = cuw.get((a, b), 0) + 1
            cu[a] = cu.get(a, 0) + 1
    v = len(vocab)
    rows = []
    for d, t in sorted(toks.items()):
        if len(t) < 2:
            continue
        s = sum(math.log(cu[a] + v) - math.log(cuw[(a, b)] + 1)
                for a, b in zip(t[:-1], t[1:]))
        rows.append((d, len(t) - 1, round(s / (len(t) - 1), 6)))
    return pd.DataFrame(rows, columns=["doc_id", "n_trans", "avg_nll"])


def _corpus(n=80, seed=5):
    rng = np.random.default_rng(seed)
    words = "the a cat dog runs sits fast slow red blue".split()
    texts = [" ".join(rng.choice(words, size=rng.integers(2, 40)))
             for _ in range(n)]
    texts[3] = "single"          # excluded: one token
    texts[7] = ""                # excluded: empty
    texts[11] = "the cat " * 30  # fluent/repetitive → low NLL
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _canon(df):
    return df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_trans", "avg_nll"]]


def test_matches_reference(ray_session):
    docs = _corpus()
    got = _canon(bigram_nll_census(rd.from_pandas(docs).repartition(5)
                                   ).to_pandas())
    want = _canon(_reference(docs))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # short/empty docs excluded
    assert 3 not in set(got["doc_id"]) and 7 not in set(got["doc_id"])
    # the repetitive doc scores below the corpus median (fluency signal)
    rep = got.set_index("doc_id").loc[11, "avg_nll"]
    assert rep < got["avg_nll"].median()


def test_layout_invariance(ray_session):
    docs = _corpus(seed=9)
    a = _canon(bigram_nll_census(rd.from_pandas(docs).repartition(2)
                                 ).to_pandas())
    b = _canon(bigram_nll_census(
        rd.from_pandas(docs.iloc[::-1].reset_index(drop=True)
                       ).repartition(11)).to_pandas())
    pd.testing.assert_frame_equal(a, b)  # bit-identical incl. floats


def test_exact_distinct_scalar(ray_session):
    df = pd.DataFrame({"x": np.repeat(np.arange(137, dtype=np.int64), 3)})
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(6)
    assert exact_distinct_scalar(ds, "x") == 137
