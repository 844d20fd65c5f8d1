"""Round-4 session-i ops: connected-component blob census."""
from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raqc_ray.codecs import encode_image
from raqc_ray.ops.blobs import blob_census, blob_stats_of


def _brute_blobs(mask: np.ndarray) -> tuple[int, int, int]:
    """(fg_px, n_blobs, max_blob_px) via per-pixel BFS (4-conn)."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    sizes = []
    for i in range(h):
        for j in range(w):
            if mask[i, j] and not seen[i, j]:
                q = deque([(i, j)])
                seen[i, j] = True
                c = 0
                while q:
                    a, b = q.popleft()
                    c += 1
                    for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        x, y = a + da, b + db
                        if (0 <= x < h and 0 <= y < w and mask[x, y]
                                and not seen[x, y]):
                            seen[x, y] = True
                            q.append((x, y))
                sizes.append(c)
    return int(mask.sum()), len(sizes), max(sizes) if sizes else 0


def _img_of(mask: np.ndarray) -> np.ndarray:
    """White-on-black uint8 RGB render of a boolean mask."""
    return np.where(mask[..., None], 255, 0).astype(np.uint8).repeat(
        3, axis=2).reshape(*mask.shape, 3)


def _from_str(s: str) -> np.ndarray:
    rows = s.strip().split("\n")
    return np.array([[c == "#" for c in r] for r in rows])


SPIRAL = _from_str("""
#######
......#
#####.#
#...#.#
#.#.#.#
#.###.#
#.....#
#######
""")

COMB = _from_str("""
#.#.#.#.#
#.#.#.#.#
#########
""")

DIAG = _from_str("""
#.#.
.#.#
#.#.
""")

U_SHAPE = _from_str("""
##...##
##...##
##...##
#######
#######
""")


@pytest.mark.parametrize("mask", [SPIRAL, COMB, DIAG, U_SHAPE],
                         ids=["spiral", "comb", "diag", "u"])
def test_blob_adversarial_shapes(mask):
    got = blob_stats_of(_img_of(mask))
    assert got[:3] == _brute_blobs(mask)


def test_blob_diag_not_merged():
    # corner-touching pixels are SEPARATE components under 4-conn
    assert blob_stats_of(_img_of(DIAG))[1] == 6


def test_blob_random_brute_equivalence():
    rng = np.random.default_rng(7)
    for _ in range(120):
        h, w = rng.integers(1, 24, 2)
        mask = rng.random((h, w)) < rng.uniform(0.1, 0.9)
        got = blob_stats_of(_img_of(mask))
        assert got[:3] == _brute_blobs(mask)


def test_blob_empty_and_full():
    assert blob_stats_of(np.zeros((5, 5, 3), np.uint8)) == (0, 0, 0, 0)
    full = np.full((4, 6, 3), 255, np.uint8)
    assert blob_stats_of(full) == (24, 1, 24, 4)


def test_blob_n_runs():
    # comb: 2 rows x 5 teeth + 1 solid row = 11 horizontal runs
    assert blob_stats_of(_img_of(COMB))[3] == 11


def test_blob_threshold_is_exact_integer():
    # R+G+B = 381 is NOT foreground, 382 is (predicate is sum > 381)
    a = np.full((1, 2, 3), 127, np.uint8)       # sum 381
    b = a.copy()
    b[0, 1, 0] = 128                            # sum 382
    assert blob_stats_of(a) == (0, 0, 0, 0)
    assert blob_stats_of(b) == (1, 1, 1, 1)


def test_blob_stage_decode_and_degradation(ray_session):
    masks = [SPIRAL, COMB, DIAG, U_SHAPE]
    rows = []
    for i, m in enumerate(masks):
        fmt = "ppm" if i % 2 == 0 else "png"
        rows.append({"image_id": str(i),
                     "bytes": encode_image(_img_of(m), fmt),
                     "fmt": fmt})
    rows.append({"image_id": "bad", "bytes": b"not an image",
                 "fmt": "png"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    out = (blob_census(ds, batch_size=2).to_pandas()
           .set_index("image_id"))
    for i, m in enumerate(masks):
        fg, nb, mx = _brute_blobs(m)
        r = out.loc[str(i)]
        assert bool(r["ok"])
        assert (int(r["fg_px"]), int(r["n_blobs"]),
                int(r["max_blob_px"])) == (fg, nb, mx)
    bad = out.loc["bad"]
    assert not bool(bad["ok"]) and bad["error"]


# ---------------------------------------------------------------- banding

from raqc_ray.ops.banding import banding_census, banding_stats_of


def _brute_banding(arr: np.ndarray, max_lag: int = 16):
    h, w = arr.shape[:2]
    q = [int(arr[r].astype(np.int64).sum()) // w for r in range(h)]
    tot = sum(q)
    y = [h * v - tot for v in q]
    lmax = min(h - 1, max_lag)
    acv = [sum(y[r] * y[r + lag] for r in range(h - lag))
           for lag in range(lmax + 1)]
    best = max(range(1, lmax + 1), key=lambda l: (acv[l], -l))
    return best, acv[best], acv[0], int(2 * acv[best] > acv[0])


def _rows_img(c: np.ndarray, w: int = 8) -> np.ndarray:
    return np.ascontiguousarray(
        np.repeat(c.astype(np.uint8)[:, None, None], w, axis=1)
        .repeat(3, axis=2))


def test_banding_comb_detects_period():
    rr = np.arange(48)
    for p in (2, 3, 5, 7):
        arr = _rows_img(40 + np.where(rr % p == 0, 60, 0))
        best, peak, a0, per = banding_stats_of(arr)
        assert best == p and per == 1
        assert (best, peak, a0, per) == _brute_banding(arr)


def test_banding_constant_frame():
    arr = np.full((10, 4, 3), 77, np.uint8)
    assert banding_stats_of(arr) == (1, 0, 0, 0)


def test_banding_brute_equivalence_random():
    rng = np.random.default_rng(23)
    for _ in range(60):
        h = int(rng.integers(2, 40))
        c = rng.integers(0, 256, h)
        arr = _rows_img(c, w=int(rng.integers(1, 9)))
        assert banding_stats_of(arr) == _brute_banding(arr)


def test_banding_nonconstant_rows_floor_division():
    # rows whose pixel sum does NOT divide w exercise the floor q_r
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (20, 7, 3)).astype(np.uint8)
    assert banding_stats_of(arr) == _brute_banding(arr)


def test_banding_stage_degradation(ray_session):
    rr = np.arange(32)
    rows = [{"image_id": "p3",
             "bytes": encode_image(_rows_img(40 + np.where(rr % 3 == 0,
                                                           60, 0)), "png"),
             "fmt": "png"},
            {"image_id": "bad", "bytes": b"xx", "fmt": "jpeg"}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = banding_census(ds, batch_size=8).to_pandas().set_index("image_id")
    assert int(out.loc["p3", "best_lag"]) == 3
    assert bool(out.loc["p3", "ok"]) and not bool(out.loc["bad", "ok"])


# ----------------------------------------------------------------- cusum

from raqc_ray.ops.cusum import grouped_int_cusum


def _brute_cusum(df: pd.DataFrame, kref: int, h: int,
                 scale: int = 100) -> pd.DataFrame:
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        s = 0
        for _, r in g.iterrows():
            vi = int(np.floor(r["value"] * scale + 0.5))
            s = max(0, s + vi - kref)
            rows.append((uid, int(r["event_id"]), s, int(s > h)))
    return (pd.DataFrame(rows, columns=["user_id", "event_id",
                                        "cusum", "alarm"])
            .sort_values(["user_id", "event_id"])
            .reset_index(drop=True))


def _cusum_fixture(n_users: int, n_ev: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = n_users * n_ev
    return pd.DataFrame({
        "user_id": rng.integers(0, n_users, n),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
        "event_id": np.arange(n),
        "value": rng.uniform(0, 120, n).round(2),
    })


def test_cusum_matches_sequential_recursion(ray_session):
    import ray.data as rd2
    df = _cusum_fixture(13, 40, 3)
    out = (grouped_int_cusum(rd2.from_pandas(df).repartition(5),
                             "user_id", "ts", "event_id", "value",
                             kref=5000, h=8000)
           .to_pandas().sort_values(["user_id", "event_id"])
           .reset_index(drop=True).astype("int64"))
    exp = _brute_cusum(df, kref=5000, h=8000).astype("int64")
    pd.testing.assert_frame_equal(out[exp.columns], exp)
    assert 0 < exp["alarm"].mean() < 1     # both classes present


def test_cusum_layout_invariant(ray_session):
    import ray.data as rd2
    df = _cusum_fixture(7, 25, 9)
    outs = []
    for parts in (1, 4, 11):
        o = (grouped_int_cusum(
                rd2.from_pandas(df.sample(frac=1, random_state=parts))
                .repartition(parts),
                "user_id", "ts", "event_id", "value",
                kref=5500, h=6000)
             .to_pandas().sort_values(["user_id", "event_id"])
             .reset_index(drop=True).astype("int64"))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_cusum_hot_key(ray_session):
    # one user owns 60% of rows spanning every block: the boundary
    # re-dispatch path must still produce the exact sequential chain
    import ray.data as rd2
    df = _cusum_fixture(10, 20, 17)
    df.loc[df.index[:120], "user_id"] = 3
    out = (grouped_int_cusum(rd2.from_pandas(df).repartition(8),
                             "user_id", "ts", "event_id", "value",
                             kref=5200, h=9000)
           .to_pandas().sort_values(["user_id", "event_id"])
           .reset_index(drop=True).astype("int64"))
    exp = _brute_cusum(df, kref=5200, h=9000).astype("int64")
    pd.testing.assert_frame_equal(out[exp.columns], exp)


# -------------------------------------------------------------- gradients

from raqc_ray.ops.gradients import gradient_census, gradient_stats_of


def _brute_grad(arr: np.ndarray):
    c = arr.astype(np.int64).sum(axis=2)
    gx = sum(abs(int(c[y, x + 1]) - int(c[y, x]))
             for y in range(c.shape[0]) for x in range(c.shape[1] - 1))
    gy = sum(abs(int(c[y + 1, x]) - int(c[y, x]))
             for y in range(c.shape[0] - 1) for x in range(c.shape[1]))
    return gx, gy, int(gx > gy) - int(gx < gy)


def test_gradient_closed_forms():
    yy, xx = np.mgrid[0:12, 0:16]
    a = 30
    col = np.repeat((50 + a * (xx % 2)).astype(np.uint8)[..., None],
                    3, axis=2)
    row = np.repeat((50 + a * (yy % 2)).astype(np.uint8)[..., None],
                    3, axis=2)
    assert gradient_stats_of(col) == (12 * 15 * 3 * a, 0, 1)
    assert gradient_stats_of(row) == (0, 11 * 16 * 3 * a, -1)
    flat = np.full((5, 7, 3), 99, np.uint8)
    assert gradient_stats_of(flat) == (0, 0, 0)


def test_gradient_transpose_swaps_axes():
    rng = np.random.default_rng(31)
    arr = rng.integers(0, 256, (9, 14, 3)).astype(np.uint8)
    gx, gy, _ = gradient_stats_of(arr)
    tx, ty, _ = gradient_stats_of(np.ascontiguousarray(
        arr.transpose(1, 0, 2)))
    assert (gx, gy) == (ty, tx)


def test_gradient_brute_equivalence():
    rng = np.random.default_rng(41)
    for _ in range(25):
        h, w = rng.integers(1, 15, 2)
        arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert gradient_stats_of(arr) == _brute_grad(arr)


def test_gradient_stage_degradation(ray_session):
    yy, xx = np.mgrid[0:12, 0:16]
    arr = np.repeat((50 + 20 * (xx % 2)).astype(np.uint8)[..., None],
                    3, axis=2)
    rows = [{"image_id": "v", "bytes": encode_image(
                np.ascontiguousarray(arr), "png"), "fmt": "png"},
            {"image_id": "bad", "bytes": b"zz", "fmt": "ppm"}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = (gradient_census(ds, batch_size=4).to_pandas()
           .set_index("image_id"))
    assert int(out.loc["v", "gx_sum"]) == 12 * 15 * 3 * 20
    assert int(out.loc["v", "gy_sum"]) == 0
    assert not bool(out.loc["bad", "ok"])


# -------------------------------------------------------------- exprcheck

from raqc_ray.config import ExprCheck, ExprRule, RunConfig
from raqc_ray.ops.exprcheck import (compile_expr, expr_violations,
                                    violation_mask)
from raqc_ray.stages.passa import ValidatorStage


def test_exprcheck_ast_eval():
    t = pa.table({"a": [1, 2, None, 4], "b": [2, 1, 5, 4],
                  "s": ["xy", "", None, "abcd"]})
    fn = compile_expr(("<=", ("col", "a"), ("col", "b")))
    # a<=b: [T, F, NULL, T] -> violations: [F, T, T, F] (NULL violates)
    assert violation_mask(fn, t).tolist() == [False, True, True, False]
    fn = compile_expr(("==", ("len", ("col", "s")), ("lit", 2)))
    assert violation_mask(fn, t).tolist() == [False, True, True, True]
    fn = compile_expr((">=", ("*", ("col", "a"), ("lit", 10)),
                       ("+", ("col", "b"), ("lit", 5))))
    # 10a >= b+5: [10>=7 T, 20>=6 T, NULL, 40>=9 T]
    assert violation_mask(fn, t).tolist() == [False, False, True, False]
    fn = compile_expr(("or", ("is_null", ("col", "a")),
                       (">", ("col", "a"), ("lit", 3))))
    assert violation_mask(fn, t).tolist() == [True, True, False, False]
    fn = compile_expr(("not", ("is_null", ("col", "s"))))
    assert violation_mask(fn, t).tolist() == [False, False, True, False]


def test_exprcheck_compile_errors():
    with pytest.raises(ValueError):
        compile_expr(("frobnicate", ("col", "a")))
    with pytest.raises(ValueError):
        compile_expr(())


def test_exprcheck_dataset_op(ray_session):
    df = pd.DataFrame({"id": np.arange(20),
                       "x": np.arange(20) % 7,
                       "y": np.arange(20) % 5})
    out = (expr_violations(rd.from_pandas(df).repartition(3), ["id"],
                           [("x_le_y", ("<=", ("col", "x"),
                                        ("col", "y")))])
           .to_pandas())
    exp = set(df.loc[~(df.x <= df.y), "id"])
    assert set(out["id"]) == exp and (out["rule"] == "x_le_y").all()


def test_exprcheck_validator_stage_integration():
    # cross-column rule through the Pass-A stage: w*h bounded, and a
    # rule referencing a missing column is skipped (not a crash)
    cfg = RunConfig(checks=[ExprCheck(rules=(
        ExprRule("pixels_bounded",
                 ("<=", ("*", ("col", "w"), ("col", "h")),
                  ("lit", 100))),
        ExprRule("ghost_col", ("==", ("col", "nope"), ("lit", 1))),
    ))], partition_from=("none",))
    batch = pa.table({"image_id": ["a", "b", "c"],
                      "w": [5, 20, None], "h": [10, 10, 3]})
    out = ValidatorStage(cfg)(batch).to_pandas()
    v = out[(out["kind"] == "v") & (out["check"] == "expr")]
    # b: 200 > 100 violates; c: NULL violates; a passes
    assert set(v["image_id"]) == {"b", "c"}
    assert (v["column"] == "pixels_bounded").all()
