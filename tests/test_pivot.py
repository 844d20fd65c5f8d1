"""Pivot/crosstab op (ops/pivot.py): counts path is oracle-checked by
q42; these cover the value-sum path, undeclared labels, and layout
invariance."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def test_pivot_sums_and_unknown_labels(rd):
    from raqc_ray.ops.pivot import pivot_agg

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "lab": ["a", "b", "a", "a", "zzz", "b"],  # zzz undeclared
            "v": [1.0, 2.0, 4.0, 8.0, 100.0, 16.0],
        }
    )
    out = (
        pivot_agg(rd.from_pandas(df).repartition(3), "k", "lab",
                  ["a", "b"], value_col="v", prefix="sum_")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["sum_a"].tolist() == [5.0, 8.0, 0.0]
    assert out["sum_b"].tolist() == [2.0, 0.0, 16.0]
    # undeclared label contributes to NO column but the key still shows
    assert 2 in out["k"].tolist() and 100.0 not in out.values


def test_pivot_counts_layout_invariant(rd):
    from raqc_ray.ops.pivot import pivot_agg

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 30, 2000),
            "lab": rng.choice(["x", "y", "z"], 2000),
        }
    )
    outs = []
    for nparts in (1, 9):
        o = (
            pivot_agg(rd.from_pandas(df).repartition(nparts), "k", "lab",
                      ["x", "y", "z"], prefix="n_")
            .to_pandas().sort_values("k").reset_index(drop=True)
            .astype("int64")
        )
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    ref = pd.crosstab(df["k"], df["lab"])
    assert outs[0]["n_x"].tolist() == ref["x"].tolist()
