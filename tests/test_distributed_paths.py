"""Size-triggered distributed fallback ≡ single-task path (VERDICT r1 #1).

Each shuffle check reduces its narrow partials either in ONE Ray task
(small inputs) or via a distributed groupby-aggregate (above
``driver_threshold`` materialized partial rows).  These tests force BOTH
paths on the same planted input — by passing a threshold of 0 vs a huge
one — and assert the emitted violations are byte-identical, which is the
contract ``decide_path`` (checks/_util.py) must keep at any scale.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make_pid_fn():
    # built via the package factory so Ray workers unpickle it by
    # reference to raqc_ray (the tests/ dir is not on worker sys.path)
    from raqc_ray.partitions import make_pid_fn

    return make_pid_fn(("column", "pid"))


def _sorted_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    if len(df) == 0:
        return df
    return (df.sort_values(list(df.columns)).reset_index(drop=True))


@pytest.fixture()
def images_tbl():
    rng = np.random.default_rng(7)
    n = 4000
    ids = [f"img_{i:06d}" for i in range(n)]
    # plant duplicates: 5 keys appear twice more each, across partitions
    for k in range(5):
        ids[100 + k] = f"dup_{k}"
        ids[2000 + k] = f"dup_{k}"
        ids[3500 + k] = f"dup_{k}"
    return pa.table(
        {
            "image_id": pa.array(ids),
            "caption": pa.array([f"caption {i}" for i in range(n)]),
            "phash": pa.array(rng.integers(-(2**62), 2**62, n), pa.int64()),
            "pid": pa.array((np.arange(n) % 4).astype(np.int64)),
        }
    )


def test_uniqueness_both_paths_identical(ray_session, images_tbl):
    import ray.data as rd

    from raqc_ray.checks.uniqueness import uniqueness_violations

    ds = rd.from_arrow(images_tbl).repartition(8)
    small = uniqueness_violations(ds, "image_id", "e0", _make_pid_fn(),
                                  driver_threshold=10**12)
    wide = uniqueness_violations(ds, "image_id", "e0", _make_pid_fn(),
                                 driver_threshold=0)
    a, b = _sorted_df(small), _sorted_df(wide)
    assert len(a) > 0  # planted dups found
    pd.testing.assert_frame_equal(a, b)
    # ADVICE-low: the configured column name must be reported, not a
    # hardcoded 'image_id'
    ds2 = rd.from_arrow(images_tbl.rename_columns(
        ["doc_id", "caption", "phash", "pid"]))
    v = uniqueness_violations(ds2, "doc_id", "e0", _make_pid_fn(),
                              driver_threshold=10**12).to_pandas()
    assert set(v["column"]) == {"doc_id"}


def test_referential_both_paths_identical(ray_session, images_tbl):
    import ray.data as rd

    from raqc_ray.checks.referential import referential_violations
    from raqc_ray.config import ReferentialCheck

    imgs = images_tbl.filter(
        pa.compute.invert(
            pa.compute.starts_with(images_tbl["image_id"].cast(pa.string()),
                                   "dup_")))
    # captions side: drop 3 (missing caption), add 2 orphans, mutate 2
    cap_df = imgs.select(["image_id", "caption"]).to_pandas()
    cap_df = cap_df.iloc[3:].copy()
    cap_df.loc[cap_df.index[:2], "caption"] = "MUTATED"
    cap_df = pd.concat(
        [cap_df,
         pd.DataFrame({"image_id": ["orphan_a", "orphan_b"],
                       "caption": ["x", "y"]})],
        ignore_index=True)
    cap_ds = rd.from_pandas(cap_df).repartition(4)
    img_ds = rd.from_arrow(imgs).repartition(8)
    spec = ReferentialCheck(side_path="unused")

    small = referential_violations(img_ds, cap_ds, spec, "e0", _make_pid_fn(),
                                   driver_threshold=10**12)
    wide = referential_violations(img_ds, cap_ds, spec, "e0", _make_pid_fn(),
                                  driver_threshold=0)
    a, b = _sorted_df(small), _sorted_df(wide)
    assert (a["check"] == "referential").all()
    # 2 orphans + 3 missing + 2 mutated
    assert len(a) == 7
    pd.testing.assert_frame_equal(a, b)


def test_neardup_both_paths_identical(ray_session):
    import ray.data as rd

    from raqc_ray.checks.neardup import neardup_violations
    from raqc_ray.config import NearDupCheck

    rng = np.random.default_rng(11)
    n = 3000
    ph = rng.integers(0, 2**63, n).astype(np.uint64)
    # plant 6 near-dup pairs at hamming 1-2
    for k in range(6):
        base = ph[10 * k]
        ph[10 * k + 5] = base ^ np.uint64(1 << (k % 60))
    tbl = pa.table(
        {
            "image_id": pa.array([f"img_{i:06d}" for i in range(n)]),
            "phash": pa.array(ph.view(np.int64), pa.int64()),
            "pid": pa.array((np.arange(n) % 4).astype(np.int64)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6)
    spec = NearDupCheck()
    small = neardup_violations(ds, spec, "e0", _make_pid_fn(),
                               driver_threshold=10**12)
    wide = neardup_violations(ds, spec, "e0", _make_pid_fn(), driver_threshold=0)
    a, b = _sorted_df(small), _sorted_df(wide)
    assert len(a) >= 12  # ≥6 pairs × 2 rows
    pd.testing.assert_frame_equal(a, b)


def test_decide_path_env_override(ray_session, monkeypatch):
    import ray.data as rd

    from raqc_ray.checks._util import decide_path

    ds = rd.range(100)
    # no env: size decides
    monkeypatch.delenv("RAQC_DISTRIBUTED_SCAN", raising=False)
    _, n, dist = decide_path(ds, driver_threshold=10)
    assert n == 100 and dist is True
    _, _, dist = decide_path(ds, driver_threshold=1000)
    assert dist is False
    # env=1 forces distributed even when tiny
    monkeypatch.setenv("RAQC_DISTRIBUTED_SCAN", "1")
    _, _, dist = decide_path(ds, driver_threshold=1000)
    assert dist is True
    # env=0 forces single-task even when huge
    monkeypatch.setenv("RAQC_DISTRIBUTED_SCAN", "0")
    _, _, dist = decide_path(ds, driver_threshold=10)
    assert dist is False


def test_embdup_sorted_scan_path_identical(ray_session, monkeypatch):
    """Distributed embedding-dup verify (sorted-block bucket scan) is
    byte-identical to the single-task path — the map_groups-per-bucket
    stage was replaced by scan_sorted_groups (groupscan.py rationale)."""
    import ray.data as rd

    from raqc_ray.ops.dedup import embedding_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.normal(size=(60, 64))
    rows = []
    vid = 0
    for i in range(60):
        v = base[i]
        rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist()})
        vid += 1
        if i % 4 == 0:  # plant near-dups
            w = v + rng.normal(scale=0.01, size=64)
            rows.append({"vec_id": vid,
                         "embedding": w.astype(np.float32).tolist()})
            vid += 1
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(6)

    monkeypatch.setenv("RAQC_DISTRIBUTED_SCAN", "1")
    dist = _sorted_df(embedding_dup_pairs(ds, threshold=0.95))
    monkeypatch.setenv("RAQC_DISTRIBUTED_SCAN", "0")
    single = _sorted_df(embedding_dup_pairs(ds, threshold=0.95))
    assert len(dist) >= 10
    pd.testing.assert_frame_equal(dist, single)
