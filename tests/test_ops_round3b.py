"""Unit + randomized-equivalence tests for the round-3 second-batch
operators: unnest/token counts, grouped moments, exact discrete
quantiles, rollup, JSON extraction, NTILE, hopping windows, broadcast
join. Each is checked against an independent pandas/numpy reference
(not the operator's own code path) on data with the relevant edge
cases: empty tokens, ties, groups smaller than the tile count, rows in
multiple windows, unmatched join keys."""

import math

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def test_explode_tokens_positions(rd):
    from raqc_ray.ops.unnest import explode_tokens

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c", "x  y", ""],  # double space → empty token
    })
    out = explode_tokens(rd.from_pandas(df), "doc_id", "text").to_pandas()
    got = sorted(map(tuple, out[["doc_id", "pos", "token"]].to_numpy()))
    # doc 2: "x  y".split(' ') == ['x','','y'] → positions 0 and 2
    assert got == [(1, 0, "a"), (1, 1, "b"), (1, 2, "c"),
                   (2, 0, "x"), (2, 2, "y")]


def test_token_counts_min_count(rd):
    from raqc_ray.ops.unnest import token_counts

    df = pd.DataFrame({"text": ["a a b", "a c", "b c c"]})
    out = token_counts(rd.from_pandas(df), "text",
                       min_count=3).to_pandas()
    assert dict(zip(out["token"], out["n"])) == {"a": 3, "c": 3}


@pytest.mark.parametrize("seed", [0, 1])
def test_grouped_moments_matches_pandas(rd, seed):
    from raqc_ray.ops.moments import grouped_moments

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 500),
        "x": rng.random(500) * 50,
        "y": rng.random(500) * 1e4,
    })
    out = (grouped_moments(rd.from_pandas(df), "k", "x", "y")
           .to_pandas().set_index("k").sort_index())
    for k, g in df.groupby("k"):
        assert out.loc[k, "n"] == len(g)
        assert out.loc[k, "corr"] == pytest.approx(
            g["x"].corr(g["y"]), abs=1.1e-6)
        assert out.loc[k, "covar_samp"] == pytest.approx(
            g["x"].cov(g["y"]), rel=1e-6)
        assert out.loc[k, "stddev_x"] == pytest.approx(
            g["x"].std(), rel=1e-6)
        assert out.loc[k, "stddev_y"] == pytest.approx(
            g["y"].std(), rel=1e-6)


@pytest.mark.parametrize("sizes", [(1, 2, 5), (4, 10, 3)])
def test_grouped_quantile_disc_rule(rd, sizes):
    """quantile_disc rule = sorted[ceil(q*n)-1], incl. 1-row groups."""
    from raqc_ray.ops.quantile_exact import grouped_quantile_disc

    rng = np.random.default_rng(7)
    frames = []
    for i, n in enumerate(sizes):
        frames.append(pd.DataFrame(
            {"k": i, "v": rng.integers(0, 20, n).astype(float)}))
    df = pd.concat(frames, ignore_index=True)
    qs = (0.25, 0.5, 0.9)
    out = (grouped_quantile_disc(rd.from_pandas(df), "k", "v", qs=qs)
           .to_pandas().set_index("k").sort_index())
    for i, n in enumerate(sizes):
        v = np.sort(df[df.k == i]["v"].to_numpy())
        assert out.loc[i, "n"] == n
        for q, col in zip(qs, ("q0_25", "q0_5", "q0_9")):
            assert out.loc[i, col] == v[max(1, math.ceil(q * n)) - 1]


def test_rollup_levels(rd):
    from raqc_ray.ops.rollup import rollup_agg

    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["1", "2", "1", "1", "2"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = rollup_agg(rd.from_pandas(df), ["a", "b"], "v").to_pandas()
    got = {(r.a, r.b): (r.n, r.sum_value) for r in out.itertuples()}
    assert got == {
        ("x", "1"): (1, 1.0), ("x", "2"): (1, 2.0),
        ("y", "1"): (2, 7.0), ("y", "2"): (1, 5.0),
        ("x", "ALL"): (2, 3.0), ("y", "ALL"): (3, 12.0),
        ("ALL", "ALL"): (5, 15.0),
    }


def test_extract_json_int_nulls(rd):
    from raqc_ray.ops.jsonops import extract_json_int

    df = pd.DataFrame({"p": ['{"k": 3}', '{"j": 1}', '{"k": -12}',
                             '{"k": "s"}']})
    out = extract_json_int(rd.from_pandas(df), "p", "k").to_pandas()
    vals = out["k"].tolist()
    assert vals[0] == 3 and vals[2] == -12
    assert pd.isna(vals[1]) and pd.isna(vals[3])


@pytest.mark.parametrize("seed", [0, 1])
def test_grouped_ntile_matches_reference(rd, seed):
    from raqc_ray.ops.window import grouped_ntile

    rng = np.random.default_rng(seed)
    n = 300
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n),  # some keys have < 4 rows
        "id": np.arange(n),
        # coarse grid → ties in the order column
        "v": rng.integers(0, 10, n).astype(float),
    })
    res = grouped_ntile(rd.from_pandas(df), key="k", order_by="v",
                             n_tiles=4, tiebreak="id")
    out = res.to_pandas()

    def ref_ntile(g):
        s = g.sort_values(["v", "id"]).reset_index(drop=True)
        m = len(s)
        base, rem = divmod(m, 4)
        tiles = []
        for t in range(1, 5):
            tiles.extend([t] * (base + (1 if t <= rem else 0)))
        s["tile"] = tiles[:m]
        return s

    exp = (df.groupby("k", group_keys=False)[df.columns.tolist()]
           .apply(ref_ntile))
    merged = out.merge(exp, on=["k", "id", "v"], suffixes=("", "_exp"))
    assert len(merged) == n
    assert (merged["tile"] == merged["tile_exp"]).all()


def test_hopping_window_matches_bruteforce(rd):
    from raqc_ray.ops.window import hopping_window

    rng = np.random.default_rng(3)
    n = 500
    ts = (pd.to_datetime("2024-01-01")
          + pd.to_timedelta(rng.integers(0, 72 * 60, n), unit="m"))
    df = pd.DataFrame({"ts": ts, "v": np.round(rng.random(n) * 10, 3)})
    out = (hopping_window(rd.from_pandas(df), "ts", "v", "3h", "1h")
           .to_pandas().set_index("window_start").sort_index())
    # brute force: every window start covering each event
    rows = {}
    for t, v in zip(df["ts"], df["v"]):
        anchor = t.floor("1h")
        for j in range(3):
            ws = anchor - pd.Timedelta(hours=j)
            c, s = rows.get(ws, (0, 0.0))
            rows[ws] = (c + 1, s + v)
    assert len(out) == len(rows)
    for ws, (c, s) in rows.items():
        assert out.loc[ws, "n_events"] == c
        assert out.loc[ws, "sum_value"] == pytest.approx(s, abs=1e-3)


@pytest.mark.parametrize("seed", [0, 1])
def test_grouped_arg_max_matches_reference(rd, seed):
    from raqc_ray.ops.argmax import grouped_arg_max

    rng = np.random.default_rng(seed)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n),
        "id": np.arange(n),
        # coarse grid → ties in the order column exercise the tiebreak
        "v": rng.integers(0, 6, n).astype(float),
        "payload": rng.random(n),
    })
    out = (grouped_arg_max(rd.from_pandas(df), "k", "v", tiebreak="id")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.sort_values(["v", "id"])
           .groupby("k", sort=False, as_index=False).tail(1)
           .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["k", "id", "v", "payload"]],
                                  exp[["k", "id", "v", "payload"]])


def test_string_features_kernels(rd):
    from raqc_ray.ops.strings import string_features

    df = pd.DataFrame({"s": ["Hello World", "héllo", "a1b22c333", ""]})
    out = string_features(rd.from_pandas(df), "s", head_chars=4,
                          strip_pattern="[0-9]+",
                          strip_replacement="#").to_pandas()
    assert out["s_len"].tolist() == [11, 5, 9, 0]  # codepoints, not bytes
    assert out["s_head"].tolist() == ["HELL", "HÉLL", "A1B2", ""]
    assert out["s_stripped"].tolist() == ["Hello World", "héllo",
                                          "a#b#c#", ""]


def test_profile_table_reference(rd):
    from raqc_ray.ops.profile import profile_table

    df = pd.DataFrame({
        "a": [1, 2, 2, None],
        "s": ["xx", "y", None, "zzz"],
    })
    out = profile_table(rd.from_pandas(df), ["a", "s"]).set_index("col")
    assert out.loc["a", "n"] == 4 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 2
    assert out.loc["a", "min_val"] == "1.0" and out.loc["a", "max_val"] == "2.0"
    assert out.loc["a", "avg_val"] == pytest.approx(5 / 3, abs=1e-4)
    assert out.loc["s", "n_null"] == 1 and out.loc["s", "n_distinct"] == 3
    assert out.loc["s", "min_val"] == "xx" and out.loc["s", "max_val"] == "zzz"
    assert out.loc["s", "avg_val"] == pytest.approx(2.0, abs=1e-4)


@pytest.mark.parametrize("seed", [0])
def test_grouped_lead_lag_matches_reference(rd, seed):
    from raqc_ray.ops.window import grouped_lead_lag

    rng = np.random.default_rng(seed)
    n = 300
    df = pd.DataFrame({
        "k": rng.integers(0, 8, n),
        "id": np.arange(n),
        "t": rng.integers(0, 40, n),  # duplicate order values
        "v": np.round(rng.random(n) * 10, 3),
    })
    res = grouped_lead_lag(rd.from_pandas(df), key="k", order_by="t",
                                value_col="v", tiebreak="id")
    out = (res.to_pandas()
           .sort_values("id").reset_index(drop=True))
    exp = df.sort_values(["k", "t", "id"]).copy()
    exp["lag_value"] = exp.groupby("k")["v"].shift(1)
    exp["lead_value"] = exp.groupby("k")["v"].shift(-1)
    exp = exp.sort_values("id").reset_index(drop=True)
    for c in ("lag_value", "lead_value"):
        a, b = out[c].to_numpy(), exp[c].to_numpy()
        assert ((np.isnan(a) & np.isnan(b)) | (a == b)).all()


def test_broadcast_join_matches_merge(rd):
    from raqc_ray.ops.join import broadcast_join

    left = pd.DataFrame({"k": [1, 2, 3, 4, 2], "v": [10, 20, 30, 40, 21]})
    small = pd.DataFrame({"j": [1, 2, 2], "name": ["a", "b", "c"]})
    inner = (broadcast_join(rd.from_pandas(left), small, on="k",
                            right_on="j").to_pandas()
             .sort_values(["k", "v", "name"]).reset_index(drop=True))
    exp = (left.merge(small, left_on="k", right_on="j")
           .drop(columns=["j"])
           .sort_values(["k", "v", "name"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(inner, exp)
    lf = (broadcast_join(rd.from_pandas(left), small, on="k",
                         right_on="j", how="left").to_pandas())
    # 5 inner rows (two k=2 left rows × two matches) + k=3, k=4 nulls
    assert len(lf) == 7 and lf["name"].isna().sum() == 2


def test_grouped_rank_tie_semantics(rd):
    from raqc_ray.ops.window import grouped_rank

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 1, 2, 3, 3],
        "v": [10, 10, 20, 20, 30, 5, 7, 7],
        "rid": range(8),
    })
    res = grouped_rank(rd.from_pandas(df), key="k", order_by="v")
    out = (res.to_pandas()
           .sort_values(["k", "v", "rid"]).reset_index(drop=True))
    # key 1: ranks 1,1,3,3,5 (gaps), dense 1,1,2,2,3, pct (r-1)/4
    assert out.loc[out.k == 1, "rank"].tolist() == [1, 1, 3, 3, 5]
    assert out.loc[out.k == 1, "dense_rank"].tolist() == [1, 1, 2, 2, 3]
    assert out.loc[out.k == 1, "pct_rank"].tolist() == [
        0.0, 0.0, 0.5, 0.5, 1.0]
    # singleton key: pct_rank defined as 0.0
    assert out.loc[out.k == 2, "pct_rank"].tolist() == [0.0]
    assert out.loc[out.k == 3, "rank"].tolist() == [1, 1]


def test_regex_features_pii_planted(rd):
    from raqc_ray.ops.strings import PII_PATTERNS, regex_features

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["mail me at a.b-c@test.org or x@y.io thanks",
                 "see https://ex.com/p?q=1 and http://t.co",
                 "no pii here"],
    })
    out = (regex_features(rd.from_pandas(df), "text", PII_PATTERNS,
                          ["doc_id"]).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_email"].tolist() == [2, 0, 0]
    assert out["first_email"].tolist() == ["a.b-c@test.org", "", ""]
    assert out["n_url"].tolist() == [0, 2, 0]
    assert out["first_url"].tolist() == ["", "https://ex.com/p?q=1", ""]


def test_grouped_mode_tie_to_smallest(rd):
    from raqc_ray.ops.argmax import grouped_mode

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3,
        "v": ["y", "x", "x", "y", "z", "z", "w"],
    })
    out = (grouped_mode(rd.from_pandas(df), "k", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    # key a: x and y tie at 2 → smallest value "x" wins
    assert out.loc[0, ["k", "v", "n"]].tolist() == ["a", "x", 2]
    assert out.loc[1, ["k", "v", "n"]].tolist() == ["b", "z", 2]


def test_grouped_mean_outliers_exact_boundary(rd):
    from raqc_ray.ops.outliers import grouped_mean_outliers

    # group g: values 1,2,3 (mean 2, 2*mean 4) → only 5 and the exact
    # boundary case: value 4 == 2*mean must NOT be flagged (strict >)
    df = pd.DataFrame({
        "rid": range(5),
        "g": ["g"] * 5,
        "val": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    # mean of 1..5 = 3 → cut 6 → only nothing? use num=1,den=1: v > mean=3
    out = grouped_mean_outliers(rd.from_pandas(df), key="g",
                                value_col="val", scale=1, num=1, den=1,
                                keep_cols=["rid"]).to_pandas()
    assert sorted(out["rid"].tolist()) == [3, 4]
    # strict boundary: v == num/den * mean not flagged
    df2 = pd.DataFrame({"rid": range(3), "g": ["g"] * 3,
                        "val": [2.0, 2.0, 4.0]})  # mean 8/3, 1.5*mean = 4
    out2 = grouped_mean_outliers(rd.from_pandas(df2), key="g",
                                 value_col="val", scale=1, num=3, den=2,
                                 keep_cols=["rid"]).to_pandas()
    assert len(out2) == 0


def test_cube_agg_all_grouping_sets(rd):
    from raqc_ray.ops.rollup import cube_agg

    df = pd.DataFrame({
        "a": ["x", "x", "y"],
        "b": ["p", "q", "p"],
        "v": [1.0, 2.0, 4.0],
    })
    out = cube_agg(rd.from_pandas(df), ["a", "b"], "v").to_pandas()
    got = {(r.a, r.b): (r.n, r.sum_value) for r in out.itertuples()}
    assert got == {
        ("x", "p"): (1, 1.0), ("x", "q"): (1, 2.0), ("y", "p"): (1, 4.0),
        ("x", "ALL"): (2, 3.0), ("y", "ALL"): (1, 4.0),
        ("ALL", "p"): (2, 5.0), ("ALL", "q"): (1, 2.0),
        ("ALL", "ALL"): (3, 7.0),
    }


def test_grouped_token_counts(rd):
    from raqc_ray.ops.unnest import grouped_token_counts

    df = pd.DataFrame({
        "src": ["s1", "s1", "s2"],
        "text": ["a b a", "b  c", "a a"],  # double space → empty dropped
    })
    out = grouped_token_counts(rd.from_pandas(df), "src", "text").to_pandas()
    got = {(r.src, r.token): r.n for r in out.itertuples()}
    assert got == {("s1", "a"): 2, ("s1", "b"): 2, ("s1", "c"): 1,
                   ("s2", "a"): 2}


def test_grouped_rolling_frame(rd):
    from raqc_ray.ops.window import grouped_rolling

    df = pd.DataFrame({"k": [1] * 6, "t": range(6), "rid": range(6),
                       "v": [1, 2, 3, 4, 5, 6]})
    res = grouped_rolling(rd.from_pandas(df), key="k", order_by="t",
                               value_col="v", frame_rows=3,
                               tiebreak="rid")
    out = (res.to_pandas()
           .sort_values("t").reset_index(drop=True))
    assert out["roll_sum"].tolist() == [1, 3, 6, 9, 12, 15]
    assert out["roll_avg"].tolist() == [1.0, 1.5, 2.0, 3.0, 4.0, 5.0]
