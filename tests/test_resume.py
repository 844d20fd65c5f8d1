"""Kill/resume test (FIXTURES.md §5): crash after K partitions' Pass A
results are persisted, restart, assert (a) completed partitions are not
recomputed, (b) final outputs are identical to an uninterrupted run."""

import json
import os

import pandas as pd
import pytest

from raqc_ray.config import NearDupCheck, default_image_config
from raqc_ray.pipelines import validate_epoch_checkpointed


def _cfg(root, epoch):
    cfg = default_image_config(
        epoch, captions_path=os.path.join(root, epoch, "captions.parquet")
    )
    cfg.checks = [
        NearDupCheck(column="phash", hot_bucket_cap=32)
        if isinstance(c, NearDupCheck) else c
        for c in cfg.checks
    ]
    return cfg


def _parts(root, epoch):
    d = os.path.join(root, epoch)
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.startswith("part-")
    )


def _canon_violations(res) -> pd.DataFrame:
    df = res.violations.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_kill_and_resume(ray_session, t1_fixture, tmp_path):
    root = t1_fixture["root"]
    parts = _parts(root, "e1")
    assert len(parts) == 4

    # uninterrupted baseline (same chunking as the resumed run: sketch
    # partials are exact-deterministic given identical batch boundaries;
    # across different batchings they agree only within documented rank
    # error, so byte-identity is defined per chunking)
    base = validate_epoch_checkpointed(parts, _cfg(root, "e1"),
                                       str(tmp_path / "ckptA"), chunk_partitions=1)
    assert base.metrics["computed_partitions"] == [0, 1, 2, 3]

    # killed run: crash after 2 single-partition chunks persist
    ckpt_b = str(tmp_path / "ckptB")
    with pytest.raises(RuntimeError, match="simulated crash"):
        validate_epoch_checkpointed(parts, _cfg(root, "e1"), ckpt_b,
                                    chunk_partitions=1, crash_after_chunks=2)
    mdir = os.path.join(ckpt_b, "manifest", "e1")
    markers = sorted(os.listdir(mdir))
    assert markers == ["part-00000.json", "part-00001.json"]
    first_run_ids = {
        m: json.load(open(os.path.join(mdir, m)))["run_id"] for m in markers
    }

    # resume
    resumed = validate_epoch_checkpointed(parts, _cfg(root, "e1"), ckpt_b,
                                          chunk_partitions=1)
    # (a) completed partitions untouched: same run_id in their markers
    for m, rid in first_run_ids.items():
        assert json.load(open(os.path.join(mdir, m)))["run_id"] == rid
    assert resumed.metrics["resumed_partitions"] == [0, 1]
    assert resumed.metrics["computed_partitions"] == [2, 3]
    # (b) outputs identical to the uninterrupted run
    pd.testing.assert_frame_equal(_canon_violations(base),
                                  _canon_violations(resumed))
    assert base.verdicts.to_pandas().sort_values(
        ["epoch", "check", "partition_id"]).reset_index(drop=True).equals(
        resumed.verdicts.to_pandas().sort_values(
            ["epoch", "check", "partition_id"]).reset_index(drop=True))


def test_config_change_invalidates_checkpoint(ray_session, t1_fixture, tmp_path):
    from raqc_ray.config import RunConfig, NullityCheck
    from raqc_ray.state.manifest import checks_hash

    c1 = RunConfig(checks=[NullityCheck(columns=("caption",))], epoch="e1")
    c2 = RunConfig(checks=[NullityCheck(columns=("caption", "bytes"))], epoch="e1")
    assert checks_hash(c1) != checks_hash(c2)

    root = t1_fixture["root"]
    parts = _parts(root, "e1")[:1]
    ck = str(tmp_path / "ckptC")
    r1 = validate_epoch_checkpointed(parts, c1, ck)
    assert r1.metrics["computed_partitions"] == [0]
    # same config → fully resumed
    r2 = validate_epoch_checkpointed(parts, c1, ck)
    assert r2.metrics["computed_partitions"] == []
    # changed config → recompute
    r3 = validate_epoch_checkpointed(parts, c2, ck)
    assert r3.metrics["computed_partitions"] == [0]


def test_stale_checkpoint_not_unioned(ray_session, t1_fixture, tmp_path):
    """ADVICE r1: a checkpoint file for a partition no longer in the input
    (shrunk partition set) must not be silently unioned into downstream
    checks."""
    root = t1_fixture["root"]
    parts = _parts(root, "e1")
    ckpt = str(tmp_path / "ckptS")

    full = validate_epoch_checkpointed(parts, _cfg(root, "e1"), ckpt,
                                       chunk_partitions=2)
    full_rows = full.verdicts.to_pandas()
    n_full = int(full_rows[full_rows["check"] == "rowcount"]["n_rows"].sum()) \
        if "rowcount" in set(full_rows["check"]) else None

    # re-run on a SHRUNK input (first 3 partitions); part-00003.parquet
    # is still on disk from the previous run
    shrunk = validate_epoch_checkpointed(parts[:3], _cfg(root, "e1"), ckpt,
                                         chunk_partitions=2)
    v = shrunk.verdicts.to_pandas()
    # -1 is the referential orphan pseudo-partition (by design); the
    # stale on-disk partition 3 must be absent
    assert set(v["partition_id"]) <= {-1, 0, 1, 2}, \
        "stale partition 3 leaked into verdicts"
    if n_full is not None:
        n_shrunk = int(v[v["check"] == "rowcount"]["n_rows"].sum())
        assert n_shrunk < n_full
