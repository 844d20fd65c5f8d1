"""Round-4 session-j ops: FD violations, association rules, KM risk
table — closed-form planted fixtures + layout invariance."""

import numpy as np
import pandas as pd
import pytest


def _ds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


# ---------------------------------------------------------------- fdcheck

def test_fd_violations_planted(ray_session):
    from raqc_ray.ops.fdcheck import fd_violations

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3, 4, 4],
        "v": ["a", "b", "a", "c", "c", "d", "e", "f"],
    })
    out = (fd_violations(_ds(df), "k", "v").to_pandas()
           .sort_values("key").reset_index(drop=True))
    # k=1 maps to {a,b}; k=4 maps to {e,f}; k=2,3 satisfy the FD
    assert out["key"].tolist() == [1, 4]
    assert out["n_distinct"].tolist() == [2, 2]
    assert out["n_rows"].tolist() == [3, 2]
    assert out["rhs_min"].tolist() == ["a", "e"]
    assert out["rhs_max"].tolist() == ["b", "f"]


def test_fd_violations_layout_invariant(ray_session):
    from raqc_ray.ops.fdcheck import fd_violations

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 50, 2000),
        "v": rng.integers(0, 3, 2000),
    })
    outs = []
    for parts in (1, 7):
        o = (fd_violations(_ds(df, parts), "k", "v").to_pandas()
             .sort_values("key").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ----------------------------------------------------------------- assoc

def test_association_rules_closed_form(ray_session):
    from raqc_ray.ops.assoc import association_rules

    # 4 baskets: {a,b}, {a,b}, {a,c}, {b}
    df = pd.DataFrame({
        "u": [1, 1, 2, 2, 3, 3, 4, 1],      # row 8 duplicates (1, a)
        "i": ["a", "b", "a", "b", "a", "c", "b", "a"],
    })
    out = association_rules(_ds(df), "u", "i", min_pair_count=1)
    M = 10 ** 6
    r = {(a, c): row for (a, c), row in
         out.set_index(["ante", "cons"]).iterrows()}
    # N=4, n_a=3, n_b=3, n_c=1, n_ab=2, n_ac=1, n_bc=0
    ab = r[("a", "b")]
    assert ab["n_ab"] == 2 and ab["n_a"] == 3 and ab["n_b"] == 3
    assert ab["support_ppm"] == M * 2 // 4
    assert ab["confidence_ppm"] == M * 2 // 3
    assert ab["lift_ppm"] == M * 2 * 4 // 9
    ba = r[("b", "a")]
    assert ba["confidence_ppm"] == M * 2 // 3
    assert ba["lift_ppm"] == ab["lift_ppm"]
    ac = r[("a", "c")]
    assert ac["n_ab"] == 1 and ac["n_b"] == 1
    assert ac["confidence_ppm"] == M * 1 // 3
    assert ac["lift_ppm"] == M * 1 * 4 // 3
    assert ("b", "c") not in r  # never co-occur


def test_association_rules_min_count(ray_session):
    from raqc_ray.ops.assoc import association_rules

    df = pd.DataFrame({
        "u": [1, 1, 2, 2, 3, 3],
        "i": ["a", "b", "a", "b", "a", "c"],
    })
    out = association_rules(_ds(df), "u", "i", min_pair_count=2)
    assert set(zip(out["ante"], out["cons"])) == {("a", "b"), ("b", "a")}


# -------------------------------------------------------------- survival

def test_km_risk_table_closed_form(ray_session):
    from raqc_ray.ops.survival import km_risk_table

    base = pd.Timestamp("2026-01-01")
    rows = []
    # user 1: span 10 s, 3 events (censored); user 2: span 10 s,
    # 5 events (event); user 3: span 25 s, 5 events (event);
    # user 4: single row → span 0, censored
    for u, span, n in [(1, 10, 3), (2, 10, 5), (3, 25, 5), (4, 0, 1)]:
        for j in range(n):
            ts = base + pd.Timedelta(seconds=span * j / max(n - 1, 1))
            rows.append({"u": u, "ts": ts})
    df = pd.DataFrame(rows)
    out = km_risk_table(_ds(df), "u", "ts", min_events=5)
    assert out["t_s"].tolist() == [0, 10, 25]
    assert out["n_event"].tolist() == [0, 1, 1]
    assert out["n_censored"].tolist() == [1, 1, 0]
    # n_risk: lifetimes >= t → [4, 3, 1]
    assert out["n_risk"].tolist() == [4, 3, 1]


def test_km_risk_table_layout_invariant(ray_session):
    from raqc_ray.ops.survival import km_risk_table

    rng = np.random.default_rng(9)
    base = pd.Timestamp("2026-01-01").value // 1000
    df = pd.DataFrame({
        "u": rng.integers(0, 40, 1500),
        "ts": pd.to_datetime(
            base + rng.integers(0, 10**7, 1500), unit="us"),
    })
    outs = [km_risk_table(_ds(df, p), "u", "ts", min_events=30)
            for p in (1, 6)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # both classes live
    assert outs[0]["n_event"].sum() > 0 and outs[0]["n_censored"].sum() > 0


# -------------------------------------------------------------- dihedral

def test_dihedral_canonical_orbit_invariant():
    from raqc_ray.ops.dihedral import dihedral_canonical64

    rng = np.random.default_rng(21)
    for _ in range(5):
        arr = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
        base = dihedral_canonical64(arr)
        for k in range(4):
            r = np.rot90(arr, k)
            for t in (r, r[:, ::-1]):
                assert dihedral_canonical64(
                    np.ascontiguousarray(t)) == base


def test_dihedral_dup_clusters_planted(ray_session):
    import ray.data as rd

    from raqc_ray.codecs import encode_image
    from raqc_ray.ops.dihedral import dihedral_dup_clusters

    rng = np.random.default_rng(33)
    rows = []
    for i in range(12):
        arr = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
        rows.append({"image_id": f"{2*i:04d}",
                     "bytes": encode_image(arr, "png"), "fmt": "png"})
        # partner: rotated + flipped, OTHER codec
        t = np.ascontiguousarray(np.rot90(arr, i % 4)[:, ::-1])
        rows.append({"image_id": f"{2*i+1:04d}",
                     "bytes": encode_image(t, "ppm"), "fmt": "ppm"})
    # one undecodable row degrades, never clusters
    rows.append({"image_id": "9999", "bytes": b"junk", "fmt": "png"})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
    out = (dihedral_dup_clusters(ds, batch_size=8).to_pandas()
           .sort_values("id_min").reset_index(drop=True))
    assert len(out) == 12
    assert out["n_members"].tolist() == [2] * 12
    assert out["id_min"].tolist() == [f"{2*i:04d}" for i in range(12)]
    assert out["id_max"].tolist() == [f"{2*i+1:04d}" for i in range(12)]


# -------------------------------------------------------------- seqmatch

def test_sequence_pattern_census_closed_form(ray_session):
    from raqc_ray.ops.seqmatch import sequence_pattern_census

    base = pd.Timestamp("2026-01-01")
    rows = []
    # u1: view>click>click>purchase → 1 match (view(>click)+)
    # u2: view>purchase → 0 matches
    # u3: view>click>view>click>click → 2 matches
    seqs = {1: ["view", "click", "click", "purchase"],
            2: ["view", "purchase"],
            3: ["view", "click", "view", "click", "click"]}
    eid = 0
    for u, states in seqs.items():
        for j, st in enumerate(states):
            rows.append({"u": u, "ts": base + pd.Timedelta(seconds=j),
                         "eid": eid, "state": st})
            eid += 1
    df = pd.DataFrame(rows)
    out = (sequence_pattern_census(
        _ds(df), "u", "ts", "state", r"view(>click)+", tiebreak="eid")
        .to_pandas().sort_values("u").reset_index(drop=True))
    assert out["u"].tolist() == [1, 3]
    assert out["n_matches"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [4, 5]


def test_sequence_pattern_census_hot_key(ray_session):
    """One key owning 60% of rows rides the boundary re-dispatch."""
    from raqc_ray.ops.seqmatch import sequence_pattern_census

    rng = np.random.default_rng(11)
    n = 4000
    users = np.where(rng.random(n) < 0.6, 0, rng.integers(1, 30, n))
    states = rng.choice(["view", "click", "other"], n)
    df = pd.DataFrame({
        "u": users,
        "ts": pd.to_datetime(np.arange(n), unit="s"),
        "eid": np.arange(n),
        "state": states,
    })
    outs = []
    for parts in (1, 8):
        o = (sequence_pattern_census(
            _ds(df, parts), "u", "ts", "state", r"view(>click)+",
            tiebreak="eid").to_pandas()
            .sort_values("u").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert 0 in outs[0]["u"].tolist()  # the hot key matched somewhere


# -------------------------------------------------------------- audiorun

def test_audio_run_census_closed_form(ray_session):
    import ray.data as rd

    from raqc_ray.ops.audio import wav_encode
    from raqc_ray.ops.audiorun import audio_run_census, run_census_of

    x = np.where(np.arange(600) % 2 == 0, 1000, -1000).astype(np.int16)
    x[50:60] = 0          # silence run 10
    x[200:203] = 0        # silence run 3
    x[400:407] = 32767    # clip run 7
    assert run_census_of(x.reshape(-1, 1), 8, 32760) == (600, 2, 10, 1, 7, 7)

    rows = [{"item_id": "a", "bytes": wav_encode(x.reshape(-1, 1), 8000)},
            {"item_id": "bad", "bytes": b"nope"}]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (audio_run_census(ds, batch_size=4).to_pandas()
           .sort_values("item_id").reset_index(drop=True))
    good = out[out["ok"]]
    assert len(good) == 1 and len(out) == 2
    assert good.iloc[0][["n_samples", "sil_runs", "sil_max", "clip_runs",
                         "clip_max", "n_clipped"]].tolist() == \
        [600, 2, 10, 1, 7, 7]


def test_runs_edge_cases():
    from raqc_ray.ops.audiorun import _runs

    assert _runs(np.zeros(5, dtype=bool)) == (0, 0)
    assert _runs(np.ones(5, dtype=bool)) == (1, 5)
    m = np.array([True, False, True, True, False, True], dtype=bool)
    assert _runs(m) == (3, 2)
    assert _runs(np.array([True], dtype=bool)) == (1, 1)
