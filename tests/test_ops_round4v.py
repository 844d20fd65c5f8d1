"""Round-4 session-h ops: duplicated-span census, tile census."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raqc_ray.ops.spandup import duplicated_span_census


def _brute_spandup(texts: dict[int, str], k: int) -> pd.DataFrame:
    grams: dict[int, list[tuple]] = {}
    for d, t in texts.items():
        toks = t.split()
        grams[d] = [tuple(toks[i:i + k])
                    for i in range(len(toks) - k + 1)]
    docs_of: dict[tuple, set] = {}
    for d, gs in grams.items():
        for g in gs:
            docs_of.setdefault(g, set()).add(d)
    rows = []
    for d, gs in grams.items():
        if not gs:
            continue
        dup = sum(1 for g in gs if len(docs_of[g]) >= 2)
        rows.append((d, len(gs), dup, 10_000 * dup // len(gs)))
    return (pd.DataFrame(rows, columns=["doc_id", "n_spans",
                                        "dup_spans", "dup_bp"])
            .sort_values("doc_id").reset_index(drop=True))


def test_spandup_planted(ray_session):
    quote = "the quick brown fox jumps over the lazy dog tonight"
    texts = {
        1: "alpha beta " + quote + " gamma delta epsilon zeta",
        2: "one two three " + quote + " four five six seven eight",
        3: "unrelated words only here nothing shared at all between any",
        4: quote,                      # exact sub-document of 1 and 2
        5: "short doc",                # < k tokens: no spans, no row
        6: "a a a a a a a a a a a a",  # self-repetition, single doc
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = (duplicated_span_census(rd.from_pandas(df).repartition(3),
                                  k=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _brute_spandup(texts, 8)
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp.astype("int64"))
    r = exp.set_index("doc_id")
    assert r.loc[4, "dup_bp"] == 10_000      # fully contained
    assert r.loc[3, "dup_spans"] == 0        # nothing shared
    assert r.loc[6, "dup_spans"] == 0        # repeats only within itself
    assert 5 not in r.index                  # sub-k doc emits no row
    assert 0 < r.loc[1, "dup_bp"] < 10_000


def test_spandup_layout_invariant(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for d in range(40):
        toks = [vocab[i] for i in rng.integers(0, 30, size=20)]
        texts[d] = " ".join(toks)
    # plant a shared sentence in a third of the docs
    shared = "zeta eta theta iota kappa lambda mu nu xi"
    for d in range(0, 40, 3):
        texts[d] = texts[d] + " " + shared
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})

    def run(parts):
        ds = rd.from_pandas(df)
        if parts > 1:
            ds = ds.repartition(parts)
        return (duplicated_span_census(ds, k=5).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    a = run(1)
    pd.testing.assert_frame_equal(a.astype("int64"),
                                  run(7).astype("int64"))
    pd.testing.assert_frame_equal(a.astype("int64"),
                                  _brute_spandup(texts, 5).astype("int64"))
