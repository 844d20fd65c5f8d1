"""Equivalence gate for the fused epoch-pair Pass A
(pipelines/validate._fused_pair_passa): the single-execution path must
produce the same violations and verdicts as the two-execution path
(RAQC_FUSED_PAIR=0) on the t1 fixture — epoch labels restored, e2
partition ids de-offset, per-partition merged stats identical."""

import os

import pandas as pd
import pytest

from raqc_ray.config import NearDupCheck, default_image_config
from raqc_ray.pipelines import validate_epoch_pair


def _run_pair(root):
    cfgs = []
    for epoch in ("e1", "e2"):
        cfg = default_image_config(
            epoch, captions_path=os.path.join(root, epoch, "captions.parquet")
        )
        cfg.checks = [
            NearDupCheck(column="phash", hot_bucket_cap=32)
            if isinstance(c, NearDupCheck) else c
            for c in cfg.checks
        ]
        cfgs.append(cfg)
    parts = lambda d: sorted(
        os.path.join(root, d, f) for f in os.listdir(os.path.join(root, d))
        if f.startswith("part-")
    )
    return validate_epoch_pair(parts("e1"), parts("e2"), cfgs[0], cfgs[1])


def _canon_violations(r):
    df = r.violations.to_pandas()
    return (df.sort_values(list(df.columns))
            .reset_index(drop=True))


def _canon_verdicts(r):
    df = r.verdicts.to_pandas()
    return (df.sort_values(["partition_id", "check"])
            .reset_index(drop=True))


def test_fused_pair_matches_unfused(ray_session, t1_fixture, monkeypatch):
    root = t1_fixture["root"]
    monkeypatch.setenv("RAQC_FUSED_PAIR", "0")
    u1, u2 = _run_pair(root)
    monkeypatch.delenv("RAQC_FUSED_PAIR")
    f1, f2 = _run_pair(root)
    for u, f in ((u1, f1), (u2, f2)):
        pd.testing.assert_frame_equal(_canon_violations(u),
                                      _canon_violations(f))
        uv, fv = _canon_verdicts(u), _canon_verdicts(f)
        # stats_json embeds sketch payloads (t-digest quantiles) that are
        # legitimately batching-dependent in far decimals — compare it
        # structurally (same keys per row); everything else exactly.
        import json as _json

        for a, b in zip(uv.pop("stats_json"), fv.pop("stats_json")):
            assert set(_json.loads(a)) == set(_json.loads(b))
        pd.testing.assert_frame_equal(uv, fv)
        assert u.metrics["n_rows"] == f.metrics["n_rows"]
        assert u.metrics["n_partitions"] == f.metrics["n_partitions"]
        # merged per-(pid, check) row counts equal (payloads are
        # sketch-encoded — compare the deterministic scalar)
        assert ({k: v["n_rows"] for k, v in u.merged.items()}
                == {k: v["n_rows"] for k, v in f.merged.items()})


def test_fused_pair_guard_on_differing_configs(ray_session, t1_fixture):
    """Differing check configs must fall back to the per-epoch path (no
    crash, epochs still labeled correctly)."""
    root = t1_fixture["root"]
    cfg1 = default_image_config(
        "e1", captions_path=os.path.join(root, "e1", "captions.parquet"))
    cfg2 = default_image_config(
        "e2", captions_path=os.path.join(root, "e2", "captions.parquet"))
    cfg2.checks = [c for c in cfg2.checks
                   if not isinstance(c, NearDupCheck)]
    parts = lambda d: sorted(
        os.path.join(root, d, f) for f in os.listdir(os.path.join(root, d))
        if f.startswith("part-")
    )
    r1, r2 = validate_epoch_pair(parts("e1"), parts("e2"), cfg1, cfg2)
    v1 = r1.violations.to_pandas()
    v2 = r2.violations.to_pandas()
    assert set(v1["epoch"]) <= {"e1"} and set(v2["epoch"]) <= {"e2"}
    assert "near_dup" in set(v1["check"])
    assert "near_dup" not in set(v2["check"])
